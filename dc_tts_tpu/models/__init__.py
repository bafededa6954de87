from .layers import (init_embedding, embedding_lookup, init_layer_norm,
                     layer_norm, init_conv, conv1d, init_deconv,
                     conv1d_transpose)
from .text2mel import Text2Mel
from .ssrn import SSRN
