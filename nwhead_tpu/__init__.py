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

__all__ = [
    "get_kernel",
    "KERNEL_NAMES",
    "nw_log_probs",
    "__version__",
]
