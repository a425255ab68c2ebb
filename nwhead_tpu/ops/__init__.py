from nwhead_tpu.ops.kernels import get_kernel, KERNEL_NAMES
from nwhead_tpu.ops.nw import nw_log_probs, nw_probs_and_weights
from nwhead_tpu.ops.calibrate import apply_temperature, fit_temperature
from nwhead_tpu.ops.influence import support_influence
from nwhead_tpu.ops.pallas_nw import (
    PreparedSupport,
    concat_prepared,
    mask_prepared_rows,
    nw_fused_log_probs,
    nw_fused_from_prepared,
    prepare_for_concat,
    prepare_support,
)
from nwhead_tpu.ops.ivf import (
    IVFPrepared,
    concat_ivf,
    ivf_auto_config,
    nw_fused_ivf_log_probs,
    prepare_support_ivf,
)
from nwhead_tpu.ops.pallas_attn import (
    fused_attention,
    fused_attention_block_bf16,
    fused_attention_qkv,
    fused_attention_qkv_int8,
)
from nwhead_tpu.ops.pallas_mlp import (
    fused_mlp,
    fused_mlp_block_bf16,
    fused_mlp_int8,
)
from nwhead_tpu.ops import metrics

__all__ = [
    "get_kernel",
    "KERNEL_NAMES",
    "nw_log_probs",
    "nw_probs_and_weights",
    "nw_fused_log_probs",
    "nw_fused_from_prepared",
    "prepare_support",
    "prepare_for_concat",
    "concat_prepared",
    "mask_prepared_rows",
    "PreparedSupport",
    "IVFPrepared",
    "prepare_support_ivf",
    "nw_fused_ivf_log_probs",
    "concat_ivf",
    "ivf_auto_config",
    "apply_temperature",
    "fit_temperature",
    "support_influence",
    "fused_attention",
    "fused_attention_block_bf16",
    "fused_attention_qkv",
    "fused_attention_qkv_int8",
    "fused_mlp",
    "fused_mlp_block_bf16",
    "fused_mlp_int8",
    "metrics",
]
