from .pallas_blocks import fused_hc, fused_conv_ln_act, pallas_supported
from .pallas_attention import monotonic_attention_step
