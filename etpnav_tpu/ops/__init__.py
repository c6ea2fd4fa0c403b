from etpnav_tpu.ops.basic import (
    gelu_erf,
    quick_gelu,
    layer_norm,
    linear,
    linear_init,
    ln_init,
    embedding_init,
    gen_seq_masks,
    mask_to_bias,
    maybe_dropout,
    trunc_normal,
    NEG_INF,
)
from etpnav_tpu.ops.attention import (
    mha_init,
    mha,
    self_attention_block,
    cross_attention_block,
)
from etpnav_tpu.ops.nms import heatmap_nms
