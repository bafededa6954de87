from .losses import (guided_attention_matrix, binary_divergence, l1_loss,
                     text2mel_loss, ssrn_loss)
from .optimizer import noam_schedule, make_optimizer
from .steps import (Text2MelTrainState, SSRNTrainState, make_text2mel_step,
                    make_ssrn_step, init_text2mel_state, init_ssrn_state)
from . import checkpoint
