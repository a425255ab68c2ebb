from nwhead_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    model_sharding,
    replicated,
    support_sharding,
)
from nwhead_tpu.parallel.sharded_bank import (
    ShardedSupportBank,
    merge_partials,
    nw_partials,
    sharded_ensemble_predict_fn,
    sharded_knn_predict_fn,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "model_sharding",
    "support_sharding",
    "replicated",
    "ShardedSupportBank",
    "nw_partials",
    "merge_partials",
    "sharded_ensemble_predict_fn",
    "sharded_knn_predict_fn",
]
