"""AOT-exported serving artifacts (``jax.export``).

The reference has no deployment story at all — serving means importing the
torch model code and a checkpoint (``/root/reference/util/utils.py:32-53``).
This module packages the TPU-native equivalent of a compiled model server
artifact: the ONE-dispatch serving function built by
``NWNet.make_serving_fn`` (normalize -> featurize -> prepared fused head)
is traced, lowered to StableHLO with ``jax.export``, and written to disk
together with its operand arrays (checkpoint weights + prepared bank).
Reloading needs NO model-building Python — no flax module, no dataset, no
precompute pass — just this package for the pytree classes:

    fn = load_serving_artifact(path)     # anywhere with the same backend
    log_probs = fn(query_batch)

Design notes:
  * Weights and the prepared bank ride as ARGUMENTS of the exported
    module, stored alongside it — NOT baked as StableHLO constants. The
    artifact stays small to compile at load time (the axon remote compile
    service rejects multi-hundred-MB constant-laden bodies — the 413
    lesson), and the arrays remain inspectable/swappable on disk. (The
    int8-quantized CNN featurizer is the one exception: its folded
    weights live inside its closure by design and are baked — ~11 MB for
    resnet18, far under the service limit.)
  * The export is locked to the lowering platform (a Mosaic kernel body
    is TPU code; the interpret-mode lowering is CPU code). ``meta.json``
    records it and ``load_serving_artifact`` checks the running backend.
  * Mesh/sharded serving functions are NOT exportable (shard_map reads
    live state per call); export the single-device artifact per host.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

_MODULE = "module.jax_export"
_ARRAYS = "operands.pkl"
_META = "meta.json"


def _register_pytrees() -> None:
    """jax.export serializes the argument pytree structure; first-party
    NamedTuple nodes must be registered once per process."""
    from nwhead_tpu.models import quantize as _q
    from nwhead_tpu.models import serving_vit as _sv
    from nwhead_tpu.ops.pallas_nw import PreparedSupport

    classes = [
        PreparedSupport,
        _q.QConv, _q.QBlock, _q.QuantizedResNet, _q.QAffine,
        _q.QDenseLayer, _q.QuantizedDenseNet, _q.QDense, _q.QLayerNorm,
        _q.QViTBlock, _q.QuantizedViT,
        _sv.ServingViTBlock, _sv.ServingViT,
    ]
    for cls in classes:
        try:
            jax.export.register_namedtuple_serialization(
                cls, serialized_name=f"nwhead_tpu.{cls.__name__}"
            )
        except ValueError:
            pass  # already registered in this process


_register_pytrees()


def export_serving_artifact(
    serving_fn: Callable,
    example_batch,
    out_dir: str,
    metadata: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Export a ``NWNet.make_serving_fn`` callable to ``out_dir``.

    ``example_batch``: an array or ``jax.ShapeDtypeStruct`` with the
    serving input's shape/dtype (e.g. ``(64, 224, 224, 3)`` uint8 when the
    serving fn was built with ``normalize=...``, f32 otherwise). The
    exported module is specialized to this batch shape — export one
    artifact per compiled batch size, like the server compiles one shape.

    Returns the metadata dict written to ``meta.json``.
    """
    parts = getattr(serving_fn, "_export_parts", None)
    if parts is None:
        raise ValueError(
            "not an exportable serving fn — pass the callable returned by "
            "NWNet.make_serving_fn on a single-device net (mesh/sharded "
            "serving reads live state per call and cannot be exported)"
        )
    jitfn, get_operands = parts
    operands = get_operands()
    x_spec = jax.ShapeDtypeStruct(
        tuple(example_batch.shape), jnp.dtype(example_batch.dtype)
    )
    # np.shape + jnp.result_type: some operand leaves are Python scalars
    # (e.g. quantization act scales) — jnp.result_type applies JAX's
    # canonicalization (Python float -> f32 under disabled x64), matching
    # how the live jit traced them.
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.result_type(a)),
        operands,
    )
    exported = jax.export.export(jitfn)(*specs, x_spec)

    leaves, treedef = jax.tree_util.tree_flatten(operands)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _MODULE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _ARRAYS), "wb") as f:
        # numpy arrays (incl. ml_dtypes bfloat16/int8) + the pytree
        # structure; first-party artifact, loaded only by this module.
        pickle.dump(
            {"leaves": [np.asarray(l) for l in leaves], "treedef": treedef},
            f,
        )
    meta = {
        "platforms": list(getattr(exported, "platforms", ())),
        "input_shape": list(x_spec.shape),
        "input_dtype": str(x_spec.dtype),
        "output": "log_probs (B, n_classes)",
        "jax_version": jax.__version__,
        "n_operand_leaves": len(leaves),
        **(metadata or {}),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_serving_artifact(path: str) -> Callable:
    """Load an artifact directory into a jitted ``batch -> log-probs``
    callable. Validates the running backend against the artifact's
    lowering platform. The returned fn carries the artifact metadata as
    ``fn.meta``."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    platforms = [p.lower() for p in meta.get("platforms", [])]
    backend = jax.default_backend().lower()
    if platforms and backend not in platforms:
        raise ValueError(
            f"artifact was lowered for {platforms} but the running backend "
            f"is {backend!r} — a Mosaic (TPU) module cannot run on CPU and "
            "vice versa; re-export on the target platform"
        )
    with open(os.path.join(path, _MODULE), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(os.path.join(path, _ARRAYS), "rb") as f:
        blob = pickle.load(f)
    operands = jax.tree_util.tree_unflatten(
        blob["treedef"], [jnp.asarray(l) for l in blob["leaves"]]
    )
    call = jax.jit(exported.call)  # jit wrapper caches the compilation

    def fn(x):
        return call(*operands, x)

    fn.meta = meta
    return fn
