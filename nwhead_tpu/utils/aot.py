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
    lesson), and the arrays remain inspectable/swappable on disk. Every
    quantized featurizer family (ResNet/DenseNet/ViT) rides the same
    statics+tree split, so CNN weights are stored operands too (round 4
    closed the former int8-CNN baked-closure exception).
  * The export is locked to the lowering platform (a Mosaic kernel body
    is TPU code; the interpret-mode lowering is CPU code). ``meta.json``
    records it and ``load_serving_artifact`` checks the running backend.
  * Mesh/sharded serving: ``export_mesh_serving_artifact`` freezes the
    pod serving pipeline (normalize -> featurize -> shard_mapped
    prepared head) into ONE multi-device module; the bank shards and
    weights are stored operands with per-leaf sharding specs, and
    ``load_mesh_serving_artifact`` rebuilds the mesh from the running
    backend's devices (same device count required). Unlike
    ``NWNet.make_serving_fn`` (which reads the bank LIVE so
    add_support/remove_support edits are picked up), an artifact is a
    SNAPSHOT — re-export after bank edits.
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
    from nwhead_tpu.ops.ivf import IVFPrepared
    from nwhead_tpu.ops.pallas_nw import PreparedSupport

    classes = [
        PreparedSupport, IVFPrepared,
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
            "NWNet.make_serving_fn on a single-device net; for a mesh "
            "(sharded) net use export_mesh_serving_artifact(net, ...) "
            "instead (the live mesh callable reads bank state per call)"
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


def export_mesh_serving_artifact(
    net,
    variables: Dict[str, Any],
    example_batch,
    out_dir: str,
    normalize=None,
    metadata: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Export a mesh (pod) serving pipeline to ``out_dir``.

    Freezes ``normalize -> featurize -> shard_mapped prepared full-mode
    head`` for a ``NWNet(mesh=...)`` into one ``jax.export`` module over
    the net's mesh. Weights ride as replicated operands, the prepared
    bank shards as 'support'-sharded operands (per-leaf sharding specs
    are stored — nothing is baked as an HLO constant, the 413 lesson).
    The artifact is a SNAPSHOT of the current bank; re-export after
    ``add_support``/``remove_support``.

    ``normalize=(mean, std)`` folds uint8 pixel normalization into the
    module like ``make_serving_fn``. The query batch is sharded over
    'data' at call time; ``example_batch.shape[0]`` must divide the mesh's
    data axis like the live path.
    """
    if net.mesh is None or net.sharded_bank is None:
        raise ValueError(
            "export_mesh_serving_artifact needs a NWNet built with mesh= "
            "and a precomputed sharded bank — run precompute() first"
        )
    net._check_quantized_variables(variables)
    bank = net.sharded_bank
    if bank.prepared is None:
        # Raw-mode sharded bank (the off-TPU default): build prepared
        # shards for the snapshot from the VALID rows (the raw bank's
        # padding must not re-enter as real rows). Export-time-only cost.
        from nwhead_tpu.parallel import ShardedSupportBank

        valid = np.asarray(bank.mask) > 0
        bank = ShardedSupportBank.build(
            np.asarray(bank.feat)[valid],
            np.asarray(bank.labels)[valid],
            net.mesh,
            net.n_classes,
            kernel=bank.kernel,
            use_prepared=True,
        )
    prep = bank.prepared
    mapped, names = bank.mapped_prepared(
        net._head_kernel_params(variables)
    )
    bank_arrs = tuple(getattr(prep, n) for n in names)

    if normalize is not None:
        mean = jnp.asarray(normalize[0], jnp.float32)
        std = jnp.asarray(normalize[1], jnp.float32)

    def maybe_norm(x):
        if normalize is not None:
            return (x.astype(jnp.float32) * (1.0 / 255.0) - mean) / std
        return x

    q = getattr(net, "quantized_featurizer", None)
    if q is not None and hasattr(q, "split"):
        # QuantizedViT / ServingViT: weight tree as an argument of THIS
        # jit (mirrors make_serving_fn's serve_q — tracing the internally
        # jitted apply would bake the tree as HLO constants).
        statics, tree = q.split()
        fwd = q.unjitted_forward()
        proj = (
            variables["params"]["proj"] if net.model.proj_dim > 0 else None
        )

        # No `variables` operand here: the head's kernel params are already
        # closed into `mapped`, the featurizer weights ride in `tr`, and
        # the projection in `pj` — storing the full float tree too would
        # pickle ~344 MB of dead ViT-B weights and replicate them onto
        # every device at load for an argument the module DCEs.
        @jax.jit
        def serve_mesh(tr, pj, bank, x):
            f = fwd(statics, tr, maybe_norm(x))
            if pj is not None:
                f = f @ pj["kernel"] + pj["bias"]
            return mapped(f, *bank)

        operands = (tree, proj, bank_arrs)
        spec_tree = (
            jax.tree.map(lambda _: "rep", tree),
            jax.tree.map(lambda _: "rep", proj),
            jax.tree.map(lambda _: "support", bank_arrs),
        )
    else:
        feat = net._featurize_eval

        @jax.jit
        def serve_mesh(vv, bank, x):
            return mapped(feat(vv, maybe_norm(x)), *bank)

        operands = (variables, bank_arrs)
        spec_tree = (
            jax.tree.map(lambda _: "rep", variables),
            jax.tree.map(lambda _: "support", bank_arrs),
        )

    x_spec = jax.ShapeDtypeStruct(
        tuple(example_batch.shape), jnp.dtype(example_batch.dtype)
    )
    op_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.result_type(a)),
        operands,
    )
    exported = jax.export.export(serve_mesh)(*op_specs, x_spec)

    leaves, treedef = jax.tree_util.tree_flatten(operands)
    spec_leaves = jax.tree_util.tree_leaves(spec_tree)
    assert len(spec_leaves) == len(leaves)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _MODULE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _ARRAYS), "wb") as f:
        pickle.dump(
            {
                "leaves": [np.asarray(l) for l in leaves],
                "treedef": treedef,
                "leaf_specs": spec_leaves,
            },
            f,
        )
    mesh = net.mesh
    meta = {
        "platforms": list(getattr(exported, "platforms", ())),
        "input_shape": list(x_spec.shape),
        "input_dtype": str(x_spec.dtype),
        "output": "log_probs (B, n_classes)",
        "jax_version": jax.__version__,
        "n_operand_leaves": len(leaves),
        "mesh_axis_names": list(mesh.axis_names),
        "mesh_shape": list(mesh.devices.shape),
        "nr_devices": int(mesh.devices.size),
        **(metadata or {}),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_mesh_serving_artifact(path: str, mesh=None) -> Callable:
    """Load a mesh artifact into a ``batch -> log-probs`` callable.

    ``mesh``: an existing ``jax.sharding.Mesh`` with the artifact's axis
    names and shape; by default one is built from the first N running
    devices (N = the artifact's device count — must match, shardings are
    compiled into the module). Validates the lowering platform like the
    single-device loader."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if "mesh_shape" not in meta:
        raise ValueError(
            f"{path!r} is a single-device artifact — load it with "
            "load_serving_artifact"
        )
    platforms = [p.lower() for p in meta.get("platforms", [])]
    backend = jax.default_backend().lower()
    if platforms and backend not in platforms:
        raise ValueError(
            f"artifact was lowered for {platforms} but the running backend "
            f"is {backend!r} — re-export on the target platform"
        )
    n = int(meta["nr_devices"])
    if mesh is None:
        devs = jax.devices()
        if len(devs) < n:
            raise ValueError(
                f"artifact needs {n} devices; only {len(devs)} available"
            )
        mesh = Mesh(
            np.asarray(devs[:n]).reshape(meta["mesh_shape"]),
            axis_names=tuple(meta["mesh_axis_names"]),
        )
    else:
        if list(mesh.devices.shape) != list(meta["mesh_shape"]) or list(
            mesh.axis_names
        ) != list(meta["mesh_axis_names"]):
            raise ValueError(
                f"mesh {mesh.axis_names}{mesh.devices.shape} does not match "
                f"the artifact's {meta['mesh_axis_names']}{meta['mesh_shape']}"
            )
    with open(os.path.join(path, _MODULE), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(os.path.join(path, _ARRAYS), "rb") as f:
        blob = pickle.load(f)
    placed = [
        jax.device_put(
            l,
            NamedSharding(
                mesh,
                PartitionSpec("support")
                if spec == "support"
                else PartitionSpec(),
            ),
        )
        for l, spec in zip(blob["leaves"], blob["leaf_specs"])
    ]
    operands = jax.tree_util.tree_unflatten(blob["treedef"], placed)
    data_sharding = NamedSharding(mesh, PartitionSpec("data"))
    call = jax.jit(exported.call)

    def fn(x):
        return call(*operands, jax.device_put(jnp.asarray(x), data_sharding))

    fn.meta = meta
    fn.mesh = mesh
    return fn


def load_any_serving_artifact(path: str) -> Callable:
    """Dispatch on the artifact kind: mesh (multi-device) artifacts load
    through ``load_mesh_serving_artifact``, single-device ones through
    ``load_serving_artifact``. The one loader CLI callers should use."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if "mesh_shape" in meta:
        return load_mesh_serving_artifact(path)
    return load_serving_artifact(path)


def load_serving_artifact(path: str) -> Callable:
    """Load an artifact directory into a jitted ``batch -> log-probs``
    callable. Validates the running backend against the artifact's
    lowering platform. The returned fn carries the artifact metadata as
    ``fn.meta``."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if "mesh_shape" in meta:
        raise ValueError(
            f"{path!r} is a mesh (multi-device) artifact — load it with "
            "load_mesh_serving_artifact"
        )
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
