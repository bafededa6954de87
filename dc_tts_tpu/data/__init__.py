from .dataset import (Example, parse_transcript, load_dataset_index,
                      prepro_corpus, TrainLoader)
