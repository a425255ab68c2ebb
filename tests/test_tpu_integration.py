"""TPU integration test (opt-in: RUN_TPU=1): real ResNet-18 + NW head must
learn a 10-class pattern-recovery task end-to-end on the chip in bf16.

Last validated run: full-mode accuracy 56% -> 94% -> 97% -> 98% over 12
epochs, ~98 s wall (v5e, bf16). Kept out of the default CPU suite; this file
self-selects the real backend.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU"), reason="needs the real TPU; set RUN_TPU=1"
)


def test_resnet18_nw_learns_on_tpu():
    import jax
    import jax.numpy as jnp

    # NOTE: runs on whatever the default backend is (axon TPU on this image);
    # conftest pins tests to CPU, so undo that here.
    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()

    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.train import NWTrainer

    C = 10

    def make(n, seed):
        r = np.random.default_rng(seed)
        y = np.tile(np.arange(C), n // C)
        patterns = np.random.default_rng(42).normal(0, 1, (C, 32, 32, 3)).astype(np.float32)
        x = patterns[y] * 0.5 + r.normal(0, 1.0, (n, 32, 32, 3)).astype(np.float32)
        return ArrayDataset(x.astype(np.float32), y, num_classes=C)

    train_ds, val_ds = make(300, 1), make(100, 2)
    net = NWNet(
        load_model("resnet18", dtype=jnp.bfloat16), C, support_dataset=train_ds,
        feat_dim=512, n_way=5, n_shot=2, n_shot_full=20, n_shot_cluster=2, seed=0,
    )
    trainer = NWTrainer(net, train_ds, val_ds, lr=3e-3, batch_size=5,
                        milestones=(100,), seed=0)
    acc0 = trainer.eval_all_modes()
    for _ in range(12):
        trainer.train_epoch()
        trainer.reset_metrics()
    acc1 = trainer.eval_all_modes()
    assert acc1 > acc0 + 15, (acc0, acc1)


def test_int8_serving_parity_on_tpu():
    """The int8 serving stack on the real chip: quantize a trained-ish
    featurizer, rebuild the bank, and require full-mode predictions to track
    the float pipeline (the real int8 MXU path, not interpret mode)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()

    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet

    C = 10
    r = np.random.default_rng(3)
    y = np.tile(np.arange(C), 20)
    patterns = np.random.default_rng(42).normal(0, 1, (C, 32, 32, 3)).astype(np.float32)
    x = patterns[y] * 0.8 + r.normal(0, 0.5, (len(y), 32, 32, 3)).astype(np.float32)
    ds = ArrayDataset(x.astype(np.float32), y, num_classes=C)

    net = NWNet(load_model("resnet18"), C, support_dataset=ds,
                feat_dim=512, n_shot_full=20, seed=0)
    xq = jnp.asarray(ds.gather(np.arange(16)))
    variables = net.init(jax.random.PRNGKey(0), xq)

    net.precompute(variables)
    lp_f = np.asarray(net.predict(variables, xq, "full"))

    net.quantize_featurizer(variables, ds.gather(np.arange(64)))
    net.precompute(variables)
    lp_q = np.asarray(net.predict(variables, xq, "full"))

    # On-chip f32 exp/log rounding leaves ~2e-5 of mass error.
    np.testing.assert_allclose(np.exp(lp_q).sum(-1), 1.0, rtol=1e-4)
    assert np.max(np.abs(np.exp(lp_q) - np.exp(lp_f))) < 0.15
    agree = (lp_q.argmax(-1) == lp_f.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_fused_vit_kernels_on_tpu():
    """The fused attention + MLP Pallas kernels on REAL Mosaic (not
    interpret mode): ViT forward must match the XLA implementation."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()

    from nwhead_tpu.models import load_model

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    m_xla = load_model("vit_s16")
    m_fused = load_model("vit_s16", attn_impl="fused", mlp_impl="fused")
    v = m_xla.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(jax.jit(
        lambda vv, xx: m_xla.apply(vv, xx, train=False))(v, x))
    got = np.asarray(jax.jit(
        lambda vv, xx: m_fused.apply(vv, xx, train=False))(v, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cli_full_path_on_disk_dataset(tmp_path):
    """The complete CLI path over a real on-disk image dataset: CUB-format
    manifests -> JPEG decode -> RandomResizedCrop/flip/normalize -> episodic
    NW training -> 3-mode eval -> checkpoints. Runs on the default backend."""
    import os

    import numpy as np
    from PIL import Image

    # Build a small CUB-format tree: 4 classes x 16 images, 64x64 JPEGs with
    # class-colored patterns.
    root = tmp_path / "cub"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    patterns = rng.integers(40, 216, size=(4, 8, 8, 3))
    lines_split, lines_img, lines_lbl = [], [], []
    i = 0
    for c in range(4):
        for k in range(16):
            i += 1
            name = f"{c + 1:03d}.C/{i}.jpg"
            os.makedirs(root / "images" / f"{c + 1:03d}.C", exist_ok=True)
            img = np.kron(patterns[c], np.ones((8, 8, 1))).astype(np.float64)
            img += rng.normal(0, 25, img.shape)
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                root / "images" / name, quality=90
            )
            lines_img.append(f"{i} {name}")
            lines_lbl.append(f"{i} {c + 1}")
            lines_split.append(f"{i} {0 if k < 12 else 1}")  # 12 train / 4 test
    (root / "images.txt").write_text("\n".join(lines_img))
    (root / "image_class_labels.txt").write_text("\n".join(lines_lbl))
    (root / "train_test_split.txt").write_text("\n".join(lines_split))

    import train as T

    T.main([
        "--dataset", "bird", "--data_dir", str(root),
        "--models_dir", str(tmp_path / "runs"),
        "--num_epochs", "2", "--batch_size", "4", "--n_way", "4", "--n_shot", "2",
        "--lr", "5e-3", "--log_interval", "2", "--bf16",
        "--num_val_steps_per_epoch", "4",
    ])
    run_dir = next(p for p in (tmp_path / "runs").iterdir() if p.is_dir())
    assert (run_dir / "checkpoints" / "model.0002").exists()


def test_incremental_bank_and_serving_fn_on_tpu(tmp_path):
    """Incremental add_support + the live one-dispatch serving fn + the
    bank cache, exercised against the real prepared-bank Pallas kernel
    (not interpret mode): adds must match a fresh precompute over the
    union, the live serving callable must pick the new bank up, and a
    cache restore must serve identically."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()

    from nwhead_tpu.data import ArrayDataset, FeatureBankCache
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet

    C = 10
    r = np.random.default_rng(5)
    y = np.tile(np.arange(C), 16)
    patterns = np.random.default_rng(42).normal(0, 1, (C, 32, 32, 3)).astype(np.float32)
    x = (patterns[y] * 0.8 + r.normal(0, 0.5, (len(y), 32, 32, 3))).astype(np.float32)
    ds = ArrayDataset(x[:120], y[:120], num_classes=C)
    extra_x, extra_y = x[120:], y[120:]

    def fresh(d):
        return NWNet(load_model("resnet18"), C, support_dataset=d,
                     feat_dim=512, n_shot_full=20, seed=0,
                     fused_min_support=1)

    net = fresh(ds)
    xq = jnp.asarray(ds.gather(np.arange(16)))
    variables = net.init(jax.random.PRNGKey(0), xq)
    net.precompute(variables)
    assert net._prepared_full is not None

    fn = net.make_serving_fn(variables)
    before = np.asarray(fn(xq))
    net.add_support(variables, extra_x, extra_y)
    after = np.asarray(fn(xq))  # live bank pickup, real kernel
    assert not np.allclose(before, after)

    union = ArrayDataset(
        np.concatenate([ds.images, extra_x]),
        np.concatenate([ds.targets, extra_y]), num_classes=C,
    )
    ref = fresh(union)
    ref.precompute(variables)
    want = np.asarray(ref.predict(variables, xq, "full"))
    # Same bank as a set; on-chip f32 reassociation leaves ~1e-4.
    np.testing.assert_allclose(after, want, rtol=0, atol=5e-4)

    # Bank cache roundtrip through the prepared path.
    cache = FeatureBankCache(str(tmp_path / "bank"))
    cache.save(np.asarray(net.full_feat), np.asarray(net.full_y),
               metadata=net.support_eval.full_meta)
    net2 = fresh(ds)
    emb, lbl, meta = cache.load()
    net2.restore_bank(variables, emb, lbl, meta)
    got = np.asarray(net2.predict(variables, xq, "full"))
    np.testing.assert_allclose(got, after, rtol=0, atol=1e-5)


def test_randomized_nw_sweep_compiled_on_tpu():
    """Compiled-Mosaic randomized mini-sweep: the CPU suite's randomized
    sweeps (tests/test_pallas_nw.py) run the kernels in interpret mode —
    layout/tiling/relayout bugs only exist in the COMPILED lowering, so a
    reduced seeded sweep must also run on the real chip. Features are
    scaled so squared distances stay O(10): MXU DEFAULT precision carries
    ~3e-4 relative error, which at O(1000) score magnitudes becomes ~0.3
    absolute log-space error and no tight gate can hold (measured;
    interpret mode is exact so the CPU sweep keeps its tight gates)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from nwhead_tpu.ops.nw import nw_log_probs
    from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs, prepare_support

    kernels = ["euclidean", "hypersphere_euclidean", "cosine", "dotproduct"]
    rng = np.random.default_rng(31)
    for trial in range(4):
        kernel = kernels[int(rng.integers(len(kernels)))]
        B = int(rng.integers(1, 9))
        S = int(rng.integers(256, 2049))
        D = int(rng.integers(32, 400))
        C = int(rng.integers(4, 300))
        scale = 4.0 / np.sqrt(D)
        q = jnp.asarray(scale * rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(scale * rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        ctx = f"trial={trial} {kernel} B={B} S={S} D={D} C={C}"

        want = np.asarray(nw_log_probs(q, s, sy, C, kernel=kernel))
        got = np.asarray(nw_fused_log_probs(q, s, sy, C, kernel=kernel))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2, err_msg=ctx)
        np.testing.assert_array_equal(
            got.argmax(-1), want.argmax(-1), err_msg=ctx
        )

        prep = prepare_support(s, sy, C, kernel=kernel)
        got_p = np.asarray(nw_fused_log_probs(q, prep, None, C, kernel=kernel))
        np.testing.assert_allclose(
            got_p, want, rtol=3e-2, atol=3e-2, err_msg="prepared " + ctx
        )
        # Lossy prepared banks: probability-space agreement (quantization
        # shifts log-probs at the floor; semantics = probs + decisions).
        # int4 is skipped for raw dotproduct — unbounded score magnitudes
        # amplify 4-bit feature noise (documented PreparedSupport caveat);
        # its COMPILED unpack path is still covered by the other kernels.
        for prec, tol in (("bf16", 5e-2), ("int8", 1e-1), ("int4", 2.5e-1)):
            if prec == "int4" and kernel == "dotproduct":
                continue
            prep_l = prepare_support(s, sy, C, kernel=kernel, precision=prec)
            got_l = np.asarray(
                nw_fused_log_probs(q, prep_l, None, C, kernel=kernel)
            )
            perr = float(np.max(np.abs(np.exp(got_l) - np.exp(want))))
            assert perr < tol, (prec, perr, ctx)


def test_aot_artifact_roundtrip_on_tpu(tmp_path):
    """AOT serving artifact with a REAL Mosaic kernel body: export the
    one-dispatch serving fn on the chip, reload it, and require exact
    agreement with the live fn (same serialized module, same backend —
    the CPU suite can only prove this for interpret-mode lowerings)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    rng = np.random.default_rng(5)
    C, N = 6, 60
    y = np.tile(np.arange(C), N // C)
    x = rng.normal(0, 0.4, size=(N, 32, 32, 3)).astype(np.float32)
    x += (y / C)[:, None, None, None].astype(np.float32)
    ds = ArrayDataset(x, y, num_classes=C)
    net = NWNet(load_model("resnet10", dtype=jnp.bfloat16), C,
                support_dataset=ds, feat_dim=512, n_shot_full=10,
                fused_min_support=1, seed=0)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    net.precompute(variables)

    fn = net.make_serving_fn(variables)
    q = jnp.asarray(x[:4])
    want = np.asarray(fn(q))
    meta = export_serving_artifact(fn, q, str(tmp_path / "art_tpu"))
    assert "tpu" in [p.lower() for p in meta["platforms"]], meta

    reloaded = load_serving_artifact(str(tmp_path / "art_tpu"))
    np.testing.assert_allclose(np.asarray(reloaded(q)), want,
                               rtol=1e-5, atol=1e-5)


def test_mesh_aot_artifact_roundtrip_on_tpu(tmp_path):
    """Mesh AOT artifact with a REAL Mosaic body: the single chip hosts a
    degenerate 1x1 mesh — the export still goes through shard_map + the
    sharded-operand store/reload path, proving the pod artifact format
    compiles and runs with compiled (non-interpret) kernels."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.parallel.mesh import make_mesh
    from nwhead_tpu.utils.aot import (
        export_mesh_serving_artifact,
        load_mesh_serving_artifact,
    )

    rng = np.random.default_rng(6)
    C, N = 5, 40
    y = np.tile(np.arange(C), N // C)
    x = rng.normal(0, 0.4, size=(N, 32, 32, 3)).astype(np.float32)
    x += (y / C)[:, None, None, None].astype(np.float32)
    ds = ArrayDataset(x, y, num_classes=C)
    mesh = make_mesh(1, 1)
    net = NWNet(load_model("resnet10", dtype=jnp.bfloat16), C,
                support_dataset=ds, feat_dim=512, n_shot_full=8,
                fused_min_support=1, seed=0, mesh=mesh)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    net.precompute(variables)

    q = jnp.asarray(x[:4])
    want = np.asarray(net.predict(variables, q, "full"))
    art = str(tmp_path / "mesh_art_tpu")
    meta = export_mesh_serving_artifact(net, variables, q, art)
    assert "tpu" in [p.lower() for p in meta["platforms"]], meta
    assert meta["nr_devices"] == 1

    fn = load_mesh_serving_artifact(art)
    got = np.asarray(fn(np.asarray(q)))
    # Compiled-MXU f32 dots run in DEFAULT (fast reduced-pass) precision
    # (~3e-4 relerr, CLAUDE.md) — prob sums land at 1 +- ~1e-3 on chip.
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=2e-3)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_ivf_routed_head_compiled_on_tpu():
    """Compiled-Mosaic IVF: the tile-selective DMA stream (tile_sel SMEM
    row, skip-empty-slot logic) only exists in the compiled lowering —
    interpret mode cannot catch its alignment/layout bugs. Gates: full
    probe == the dense prepared head (same accumulation order on the
    class-sorted bank -> prob-space agreement at MXU tolerance), pruned
    probe keeps perfect top-1 agreement on a separated clustered bank at
    every precision."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        jax.config.update("jax_platforms", None)
        jax.clear_caches()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from nwhead_tpu.ops.ivf import (
        nw_fused_ivf_log_probs, prepare_support_ivf,
    )
    from nwhead_tpu.ops.pallas_nw import nw_fused_from_prepared

    rng = np.random.default_rng(17)
    # C=300 (c_pad=384): class windows can survive 128-boundary crossings
    # (W=256 < c_pad). At 128 < C <= 256 a single tile crossing class 128
    # forces W = c_pad and windows drop by design — the plain path is
    # exact there and the c_pad=256 aggregation is cheap.
    S, C, D, B = 32768, 300, 128, 16
    cents = rng.standard_normal((C, D)).astype(np.float32)
    sy = (np.arange(S, dtype=np.int32) % C)  # S % C != 0: sizes 109/110
    rng.shuffle(sy)
    sf = jnp.asarray(
        cents[sy] + 0.2 * rng.standard_normal((S, D)), jnp.float32)
    qy = rng.integers(0, C, B)
    q = jnp.asarray(
        cents[qy] + 0.2 * rng.standard_normal((B, D)), jnp.float32)

    for precision in ("f32", "bf16", "int8", "int4"):
        ivf = prepare_support_ivf(
            sf, jnp.asarray(sy), C, precision=precision, block_s=1024)
        n_tiles = ivf.prep.lane.shape[0]
        assert ivf.prep.win is not None  # class windows survive on chip
        dense = np.asarray(nw_fused_from_prepared(q, ivf.prep, C))
        full = np.asarray(nw_fused_ivf_log_probs(
            q, ivf, C, n_probe=n_tiles))
        pd = np.abs(np.exp(dense) - np.exp(full)).max()
        assert pd < 1e-5, (precision, pd)
        pruned = np.asarray(nw_fused_ivf_log_probs(q, ivf, C, n_probe=4))
        agree = (pruned.argmax(1) == dense.argmax(1)).mean()
        assert agree == 1.0, (precision, agree)
