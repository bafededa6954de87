from .pallas_common import pallas_supported, default_interpret
from .pallas_hc_vjp import hc_block_trainable, hc_train_fits
