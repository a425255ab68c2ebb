"""nwhead_tpu — a TPU-native Nadaraya-Watson head framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of the
``alanqrwang/nwhead`` reference (TMLR 2023, arXiv:2212.03411; NeurIPS 2023,
arXiv:2309.13377): nonparametric, interpretable and calibrated classification
via a Nadaraya-Watson head over a support set, with episodic training,
multiple inference modes (random/full/cluster/ensemble/knn/hnsw), support
influence explainability, and invariant-representation (IRM) training.

The compute path is pure JAX/XLA with a fused Pallas TPU kernel for the hot
distance→softmax→label-aggregate op; the support feature bank is HBM-resident
and shardable over a device mesh for pod-scale support sets.
"""

__version__ = "0.1.0"

from nwhead_tpu.ops.kernels import get_kernel, KERNEL_NAMES
from nwhead_tpu.ops.nw import nw_log_probs


def __getattr__(name):
    """Lazy top-level exports (keep `import nwhead_tpu` light)."""
    if name in ("NWNet", "NWModel"):
        from nwhead_tpu.nw import net

        return getattr(net, name)
    if name == "NWHead":
        from nwhead_tpu.nw.head import NWHead

        return NWHead
    if name == "FCNet":
        from nwhead_tpu.nw.fc import FCNet

        return FCNet
    if name == "load_model":
        from nwhead_tpu.models import load_model

        return load_model
    if name == "nw_fused_log_probs":
        from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs

        return nw_fused_log_probs
    raise AttributeError(name)


__all__ = [
    "get_kernel",
    "KERNEL_NAMES",
    "nw_log_probs",
    "nw_fused_log_probs",
    "NWNet",
    "NWModel",
    "NWHead",
    "FCNet",
    "load_model",
    "__version__",
]
