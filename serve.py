"""NW-head serving CLI: the production inference path, packaged.

Builds the fastest serving configuration this framework offers — optional
int8-PTQ featurizer (``models/quantize.py``), fused ViT kernels, prepared
(f32/bf16/int8) support bank streamed by the double-buffered Pallas head —
and then either answers queries from image files or runs a latency
benchmark over the validation set.

The reference has no serving tool at all (research repo, ``train.py``
only); this is the deploy-side complement to train.py/eval.py.

Examples:
    # Latency benchmark of the full int8 serving stack
    python serve.py --dataset bird --data_dir <cub_root> \
        --ckpt runs/.../checkpoints/model.best \
        --featurizer_precision int8 --head_precision int8 --latency_bench

    # Classify images
    python serve.py --dataset bird --data_dir <cub_root> --ckpt ... \
        --queries 'photos/*.jpg' --topk 3
"""

from __future__ import annotations

import argparse
import glob
import threading
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_server(args):
    """Construct (net, variables) ready to predict: checkpoint loaded,
    featurizer optionally quantized, support bank precomputed/prepared."""
    import train as train_cli
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.train import load_checkpoint

    ds_args = argparse.Namespace(dataset=args.dataset, data_dir=args.data_dir,
                                 seed=args.seed, workers=args.workers,
                                 decoder=args.decoder)
    train_ds, val_ds = train_cli.build_datasets(ds_args)
    mesh = train_cli.build_mesh(args)

    dtype = jnp.bfloat16 if args.bf16 else None
    extra = {}
    if args.fused_inference:
        if not args.arch.startswith("vit"):
            raise SystemExit("--fused_inference applies to ViT archs only")
        extra = {"attn_impl": "fused", "mlp_impl": "fused"}
    featurizer = load_model(args.arch, pretrained=args.pretrained_path or False,
                            dtype=dtype, **extra)

    net = NWNet(
        featurizer, train_ds.num_classes, support_dataset=train_ds,
        feat_dim=featurizer.feat_dim, proj_dim=args.proj_dim,
        kernel_type=args.kernel_type, n_shot_full=args.n_shot_full,
        head_precision=args.head_precision, seed=args.seed,
        # Every caller (the CLI and scripts/visualize.py's hand-built
        # namespace) supplies the flag explicitly — a missing attr here
        # should fail loudly, not silently default.
        ivf_n_probe=args.ivf_probe,
        ivf_group_b=args.ivf_group,
        # Serving wants the prepared streaming path whatever the bank
        # size (the default 1024-row floor targets training-loop eval,
        # where tiny banks aren't worth the prepare step).
        fused_min_support=1,
        mesh=mesh,
    )
    sample = jnp.asarray(train_ds.gather(np.arange(min(args.batch_size, len(train_ds)))))
    variables = net.init(jax.random.PRNGKey(args.seed), sample)
    if args.ckpt:
        # BN-free backbones (ViT) init with only a 'params' collection.
        target = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        restored = load_checkpoint(args.ckpt, target=target)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        print(f"Loaded checkpoint {args.ckpt}")

    if args.featurizer_precision == "int8":
        n_cal = min(args.calib_images, len(train_ds))
        net.quantize_featurizer(variables, train_ds.gather(np.arange(n_cal)))
        print(f"Quantized featurizer (int8 PTQ, {n_cal} calibration images)")
    elif args.featurizer_precision == "bf16_fused":
        net.fuse_featurizer(variables)
        print("Fused featurizer (bf16 serving graph, LN/residual folded)")

    t0 = time.perf_counter()
    # Optional disk cache: serving restarts skip the bank featurizer pass.
    # The tag pins the feature space — features from a different arch /
    # checkpoint / featurizer precision must never mix with this server's
    # query features, so a mismatch refuses loudly instead of degrading.
    cache = tag = None
    if args.bank_cache:
        from nwhead_tpu.data import FeatureBankCache

        cache = FeatureBankCache(args.bank_cache)
        tag = {
            "dataset": args.dataset,
            "arch": args.arch,
            "ckpt": args.ckpt or "",
            "pretrained_path": args.pretrained_path or "",
            # Without a checkpoint the weights come from init(seed).
            "seed": "" if args.ckpt else str(args.seed),
            "featurizer_precision": args.featurizer_precision,
            "bf16": str(bool(args.bf16)),
            "fused_inference": str(bool(args.fused_inference)),
            # Calibration size changes the int8 activation scales, i.e.
            # the quantized feature space itself.
            "calib_images": str(args.calib_images),
            "proj_dim": str(args.proj_dim),
            "n_shot_full": str(args.n_shot_full),
        }
    if cache is not None and cache.exists():
        saved = cache.load_tag()
        if saved != tag:
            raise SystemExit(
                f"--bank_cache {args.bank_cache} was built with {saved}, "
                f"this server is {tag}; use a fresh cache dir"
            )
        emb, lbl, meta = cache.load()
        net.restore_bank(variables, emb, lbl, meta)
        print(f"Support bank restored from {args.bank_cache}: "
              f"{len(lbl)} items, {time.perf_counter() - t0:.1f}s")
    else:
        net.precompute(variables)
        if cache is not None:
            cache.save(
                np.asarray(net.full_feat), np.asarray(net.full_y),
                metadata=net.support_eval.full_meta, tag=tag,
            )
            print(f"Saved bank to {args.bank_cache}")
        print(f"Support bank prepared: {len(net.full_y)} items, "
              f"{time.perf_counter() - t0:.1f}s (one-time)")
    if args.serve_mode == "ivf" and args.ivf_probe == "auto":
        # Calibrate the recall knobs against the exact head on a val
        # sample BEFORE any serving closure bakes them (NWNet raises on
        # an unresolved 'auto' in make_serving_fn).
        n_cal = min(256, len(val_ds))
        cfg = net.calibrate_ivf(
            variables, x=val_ds.gather(np.arange(n_cal)))
        print(f"IVF auto-calibrated on {n_cal} val queries: "
              f"n_probe={cfg.n_probe} group_b={cfg.group_b} "
              f"top-1 agreement {cfg.agreement:.4f} "
              f"(route diversity {cfg.route_diversity})")
    return net, variables, train_ds, val_ds


def serving_fn(net, variables, uint8_normalize=False, mode="full"):
    """The per-request device function: ONE jitted dispatch
    (normalize -> featurize -> prepared head) via ``net.make_serving_fn``
    when the prepared full-mode bank exists; falls back to the
    multi-dispatch ``predict`` path otherwise (small banks / non-fused
    kernels — e.g. CPU smoke runs). Over a high-latency device link every
    extra dispatch is a round trip, so the single-jit path is the one a
    deployment should serve from.

    ``mode='ivf'`` (``--serve_mode ivf``) serves through the IVF-pruned
    head: per-call bank DMA scales with the batch's routed tile union —
    the win for serving skew (few active classes per batch); recall knob
    is ``--ivf_probe``."""
    from nwhead_tpu.data import transforms as T

    stats = (T.IMAGENET_MEAN, T.IMAGENET_STD) if uint8_normalize else None
    try:
        return net.make_serving_fn(variables, normalize=stats, mode=mode)
    except ValueError:
        if mode != "full":
            raise  # pruned serving has no multi-dispatch fallback
        norm = T.device_normalize_fn() if uint8_normalize else None

        def f(x):
            if norm is not None and x.dtype == jnp.uint8:
                x = norm(x)
            out = net.predict(variables, x, "full")
            return out[0] if isinstance(out, tuple) else out

        return f


def latency_bench(net, variables, val_ds, args):
    """Wall-clock serving latency per predict call, INCLUDING host->device
    transfer and readback — the number a deployment actually sees (unlike
    bench.py's device-only differential numbers)."""
    bs = args.batch_size
    n = min(args.bench_batches, max(1, len(val_ds) // bs))
    serve = serving_fn(net, variables, mode=args.serve_mode)
    idx0 = np.arange(bs) % len(val_ds)
    imgs = jnp.asarray(val_ds.gather(idx0))
    for _ in range(3):  # warmup/compile
        np.asarray(serve(imgs))
    lat = []
    for i in range(n):
        idx = (np.arange(bs) + i * bs) % len(val_ds)
        batch = val_ds.gather(idx)
        t0 = time.perf_counter()
        out = serve(jnp.asarray(batch))
        _ = np.asarray(out)  # forced readback = request completed
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    report = {
        "batch_size": bs,
        "batches": n,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "mean_ms": round(float(lat_ms.mean()), 2),
        "queries_per_sec": round(bs / float(np.median(lat)), 1),
        "featurizer_precision": args.featurizer_precision,
        "head_precision": args.head_precision,
        "backend": jax.default_backend(),
    }
    print(json.dumps(report))
    return report


def microbatch_bench(net, variables, val_ds, args):
    """Request-at-a-time serving through the dynamic MicroBatcher:
    ``--concurrency`` client threads each submit single images in a
    closed loop for ``--bench_batches`` rounds; reports achieved
    queries/sec, per-REQUEST latency percentiles (submit -> result, incl.
    coalescing wait + device + readback), and mean batch occupancy — the
    number that tells a deployment how well single-request traffic fills
    the compiled batch."""
    from nwhead_tpu.utils.batching import MicroBatcher

    bs = args.batch_size
    serve = serving_fn(net, variables, mode=args.serve_mode)
    imgs = val_ds.gather(np.arange(min(64, len(val_ds))))
    np.asarray(serve(jnp.asarray(
        np.repeat(imgs[:1], bs, axis=0))))  # warm/compile at the batch shape

    occupancy = []

    def counted_serve(batch):
        return serve(jnp.asarray(batch))

    rounds = max(2, args.bench_batches)
    per_client = max(4, bs // 2)
    lat = []
    lat_lock = threading.Lock()

    with MicroBatcher(counted_serve, max_batch=bs,
                      max_wait_ms=args.microbatch_wait_ms) as mb:
        orig_take = mb._take_batch

        def counting_take():
            take = orig_take()
            if take:
                occupancy.append(len(take))
            return take

        mb._take_batch = counting_take

        def client(c):
            mine = []
            for r in range(rounds * per_client):
                x = imgs[(c + r) % len(imgs)]
                t0 = time.perf_counter()
                mb.submit(x).result(timeout=120)
                mine.append(time.perf_counter() - t0)
            with lat_lock:
                lat.extend(mine)

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

    lat_ms = np.asarray(lat) * 1e3
    report = {
        "concurrency": args.concurrency,
        "compiled_batch": bs,
        "max_wait_ms": args.microbatch_wait_ms,
        "requests": len(lat),
        "achieved_qps": round(len(lat) / wall, 1),
        "request_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "request_p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "mean_batch_occupancy": round(float(np.mean(occupancy)), 1),
        "batches_dispatched": len(occupancy),
        "backend": jax.default_backend(),
    }
    print(json.dumps(report))
    return report


def jpeg_bench(net, variables, train_ds, args):
    """Images-in -> answers-out serving throughput, starting from JPEG
    BYTES on disk (what a deployment actually receives), not pre-decoded
    tensors. Host decode (native C++ pool) runs in a producer thread
    overlapped with device inference; the steady-state rate is the
    pipelined max of the two stages. Reports both stages so the binding
    one is explicit — on photo-sized JPEGs host decode binds by a wide
    margin (the device serves tens of thousands of queries/sec while the
    host decodes hundreds of images/sec per 8 workers)."""
    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.data.datasets import ImageFileDataset
    from nwhead_tpu.utils.pipeline import jpeg_stage_rates, photo_jpegs

    bs = args.batch_size
    nb = args.bench_batches
    if args.queries:
        paths = sorted(glob.glob(args.queries))
        if not paths:
            raise SystemExit(f"no files match {args.queries!r}")
    else:
        paths = photo_jpegs(min(256, nb * bs))

    is_cifar = args.dataset in ("cifar10", "cifar100")
    # Non-CIFAR path ships uint8 and normalizes ON DEVICE: 4x less
    # host->device traffic (that link binds before decode does on thin
    # interconnects like the axon tunnel).
    t_eval = (T.cifar_eval_transform() if is_cifar
              else T.imagenet_eval_transform(device_normalize=True))
    ds = ImageFileDataset(paths, np.zeros(len(paths), np.int64),
                          train_ds.num_classes, transform=t_eval,
                          workers=args.workers, decoder=args.decoder)

    def batch(i):
        return ds.gather((np.arange(bs) + i * bs) % len(ds))

    # ONE jitted dispatch per request (normalize folded into the same jit
    # as the featurizer — over the tunnel every extra dispatch is a round
    # trip; see serving_fn). The per-stage/pipelined methodology is the
    # shared one in utils.pipeline so bench.py and this CLI cannot drift.
    serve = serving_fn(net, variables, uint8_normalize=not is_cifar,
                       mode=args.serve_mode)
    rates = jpeg_stage_rates(batch, serve, nb, bs)

    report = {
        "batch_size": bs,
        "batches": nb,
        "jpeg_hw": "480x640" if not args.queries else "user files",
        "decode_workers": args.workers,
        "decoder": args.decoder,
        "pixel_transfer": "uint8" if not is_cifar else "f32",
        **rates,
        "featurizer_precision": args.featurizer_precision,
        "head_precision": args.head_precision,
        "backend": jax.default_backend(),
    }
    print(json.dumps(report))
    return report


def answer_queries(net, variables, train_ds, args):
    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.data.datasets import ImageFileDataset

    paths = sorted(glob.glob(args.queries))
    if not paths:
        raise SystemExit(f"no files match {args.queries!r}")
    is_cifar = args.dataset in ("cifar10", "cifar100")
    explain = getattr(args, "explain", 0)
    # uint8 over the host->device link, normalize on device (same path as
    # --jpeg_bench). Explain mode needs the query FEATURES (not just the
    # prepared-head output), so it normalizes on host and goes through the
    # exact raw head — explanation is not a throughput path.
    t_eval = (T.cifar_eval_transform() if is_cifar
              else T.imagenet_eval_transform(device_normalize=not explain))
    qds = ImageFileDataset(paths, np.zeros(len(paths), np.int64),
                           train_ds.num_classes, transform=t_eval,
                           workers=args.workers, decoder=args.decoder)
    if explain:
        if args.head_precision != "f32":
            print(f"note: --explain answers use the exact f32 raw head; "
                  f"the {args.head_precision} prepared bank serves only "
                  f"unexplained paths", flush=True)
        explain_fns = _build_explainer(net, train_ds)
    else:
        serve = serving_fn(net, variables, uint8_normalize=not is_cifar,
                           mode=args.serve_mode)
    results = []
    for start in range(0, len(paths), args.batch_size):
        chunk = paths[start:start + args.batch_size]
        imgs = qds.gather(np.arange(start, start + len(chunk)))
        # Pad the ragged final chunk to the full batch: one compiled shape
        # (no per-size recompiles), and under --mesh the batch must divide
        # the 'data' axis — a short chunk would crash the shard_map.
        pad = args.batch_size - len(chunk)
        if pad > 0:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]
            )
        explanations = None
        if explain:
            out, explanations = explain_fns(variables, imgs, explain)
            out = out[: len(chunk)]
            explanations = explanations[: len(chunk)]
        else:
            out = np.asarray(serve(jnp.asarray(imgs)))[: len(chunk)]
        if args.temperature != 1.0:
            # Post-hoc calibration (fit T offline with eval.py
            # --fit_temperature); rescales reported probabilities only —
            # argmax/top-k order is unchanged.
            from nwhead_tpu.ops.calibrate import apply_temperature

            out = np.asarray(apply_temperature(out, args.temperature))
        top = np.argsort(-out, axis=-1)[:, :args.topk]
        for i, (p, t, lp) in enumerate(zip(chunk, top, out)):
            entry = {
                "file": p,
                "topk": [
                    {"class": int(c), "prob": round(float(np.exp(lp[c])), 4)}
                    for c in t
                ],
            }
            if explanations is not None:
                entry["explain"] = explanations[i]
            results.append(entry)
            print(json.dumps(entry))
    return results


def http_serve(net, variables, train_ds, val_ds, args):
    """``--http PORT``: the JSON-over-HTTP serving daemon
    (``nwhead_tpu/utils/httpd.py``) — /predict (JSON arrays, base64
    JPEGs, or a raw image body) through the MicroBatcher into the one
    compiled batch shape, /add_support and /remove_support editing the
    live bank incrementally, /healthz and /stats for operations. The
    reference has no serving layer at all; this is the deployment
    front end over ``make_serving_fn``'s one-dispatch callable."""
    from io import BytesIO

    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.utils.batching import MicroBatcher
    from nwhead_tpu.utils.httpd import NWHttpServer

    is_cifar = args.dataset in ("cifar10", "cifar100")
    image_ds = args.dataset in ("bird", "dog", "flower", "aircraft")

    decode_query = decode_support = None
    if image_ds or is_cifar:
        from PIL import Image

        # Query images ride the serving fn's input convention (uint8 over
        # the link for ImageNet-style archs, normalize on device);
        # add_support images featurize host-side, so they normalize here.
        t_query = (T.cifar_eval_transform() if is_cifar
                   else T.imagenet_eval_transform(device_normalize=True))
        t_support = (T.cifar_eval_transform() if is_cifar
                     else T.imagenet_eval_transform())

        def _decode(b, t):
            img = np.asarray(Image.open(BytesIO(b)).convert("RGB"))
            return t(img)

        decode_query = lambda b: _decode(b, t_query)  # noqa: E731
        decode_support = lambda b: _decode(b, t_support)  # noqa: E731
        input_shape = (224, 224, 3) if image_ds else (32, 32, 3)
    else:
        # Array datasets (synthetic/digits): JSON "inputs" only, at the
        # dataset's own item shape.
        input_shape = tuple(np.asarray(val_ds.gather(np.arange(1))).shape[1:])

    serve = serving_fn(net, variables, uint8_normalize=image_ds,
                       mode=args.serve_mode)
    server = NWHttpServer(
        net, variables, None,
        input_shape=input_shape, decode_query=decode_query,
        decode_support=decode_support, topk=args.topk,
        temperature=args.temperature, host=args.http_host, port=args.http,
    )
    server.batcher = MicroBatcher(
        serve, max_batch=args.batch_size,
        max_wait_ms=args.microbatch_wait_ms,
    )
    print(json.dumps({"serving": f"http://{args.http_host}:{server.port}",
                      **server.healthz()}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.httpd.server_close()
        server.batcher.close()
    return server


def export_artifact(net, variables, train_ds, val_ds, args):
    """AOT-export the serving function (``--export_artifact DIR``): one
    jax.export'd StableHLO module + its operand arrays (weights, prepared
    bank). The exported fn takes UINT8 pixels (normalization folded in,
    like the deployment path) except for CIFAR archs which are served
    pre-normalized floats."""
    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.utils.aot import (
        export_mesh_serving_artifact, export_serving_artifact,
    )

    is_cifar = args.dataset in ("cifar10", "cifar100")
    sample = np.asarray(val_ds.gather(np.arange(1)))
    hw = sample.shape[1:3]
    dtype = sample.dtype if is_cifar else np.uint8
    spec = jax.ShapeDtypeStruct((args.batch_size, hw[0], hw[1], 3),
                                jnp.dtype(dtype))
    metadata = {
        "arch": args.arch,
        "dataset": args.dataset,
        "n_classes": int(train_ds.num_classes),
        "featurizer_precision": args.featurizer_precision,
        "head_precision": args.head_precision,
        "normalize": "none (pre-normalized floats)" if is_cifar
        else "imagenet uint8 (folded into the module)",
    }
    if net.mesh is not None:
        # Pod serving artifact: one multi-device module over the net's
        # mesh (bank shards + weights as sharded/replicated operands).
        stats = None if is_cifar else (T.IMAGENET_MEAN, T.IMAGENET_STD)
        meta = export_mesh_serving_artifact(
            net, variables, spec, args.export_artifact,
            normalize=stats, metadata=metadata,
        )
    else:
        if args.serve_mode != "full":
            metadata["serve_mode"] = args.serve_mode
            # net.ivf_n_probe is the RESOLVED knob ('auto' calibrates it
            # in build_server before any closure bakes it).
            metadata["ivf_probe"] = net.ivf_n_probe
        fn = serving_fn(net, variables, uint8_normalize=not is_cifar,
                        mode=args.serve_mode)
        meta = export_serving_artifact(
            fn, spec, args.export_artifact, metadata=metadata,
        )
    report = {"exported": args.export_artifact, **meta}
    print(json.dumps(report))
    return report


def artifact_serve(args):
    """Serve from an AOT artifact (``--serve_artifact DIR``): no model
    code, dataset or precompute — deserialize, compile once, answer."""
    from nwhead_tpu.utils.aot import load_any_serving_artifact

    serve = load_any_serving_artifact(args.serve_artifact)
    meta = serve.meta
    B, H, W, _ = meta["input_shape"]
    dtype = np.dtype(meta["input_dtype"])
    out = {"artifact": args.serve_artifact, "meta": meta}

    if args.latency_bench:
        rng = np.random.default_rng(0)
        imgs = (rng.integers(0, 256, size=(B, H, W, 3)).astype(dtype)
                if dtype == np.uint8
                else rng.standard_normal((B, H, W, 3)).astype(dtype))
        imgs = jnp.asarray(imgs)
        for _ in range(3):
            np.asarray(serve(imgs))
        lat = []
        for _ in range(max(1, args.bench_batches)):
            t0 = time.perf_counter()
            _ = np.asarray(serve(imgs))
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3
        report = {
            "batch_size": B,
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
            "queries_per_sec": round(B / float(np.median(lat)), 1),
            "backend": jax.default_backend(),
        }
        print(json.dumps(report))
        out["latency"] = report

    if args.queries:
        from nwhead_tpu.data import transforms as T
        from nwhead_tpu.data.datasets import ImageFileDataset

        paths = sorted(glob.glob(args.queries))
        if not paths:
            raise SystemExit(f"no files match {args.queries!r}")
        if dtype != np.uint8:
            raise SystemExit(
                "--queries against a float-input artifact is unsupported "
                "(export with a uint8 pipeline for image files)"
            )
        t_eval = T.imagenet_eval_transform(device_normalize=True)
        qds = ImageFileDataset(paths, np.zeros(len(paths), np.int64),
                               meta.get("n_classes", 0), transform=t_eval,
                               workers=args.workers, decoder=args.decoder)
        results = []
        for start in range(0, len(paths), B):
            chunk = paths[start:start + B]
            imgs = qds.gather(np.arange(start, start + len(chunk)))
            pad = B - len(chunk)
            if pad > 0:
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]
                )
            lp = np.asarray(serve(jnp.asarray(imgs)))[: len(chunk)]
            top = np.argsort(-lp, axis=-1)[:, : args.topk]
            for pth, t, row in zip(chunk, top, lp):
                entry = {
                    "file": pth,
                    "topk": [
                        {"class": int(c),
                         "prob": round(float(np.exp(row[c])), 4)}
                        for c in t
                    ],
                }
                results.append(entry)
                print(json.dumps(entry))
        out["queries"] = results
    if not (args.latency_bench or args.queries):
        raise SystemExit(
            "--serve_artifact: pass --latency_bench and/or --queries"
        )
    return out


def _build_explainer(net, train_ds):
    """Per-query explanations from the NW head's own weights — the
    reference's flagship interpretability (``nw.py:245-249`` neighbors,
    ``util/metric.py:23-50`` leave-one-out influence), surfaced at
    query-answering time instead of a notebook.

    Returns a callable ``(variables, imgs, k) -> (log_probs, [explain])``
    where each explain dict holds the top-k support items by softmax
    weight plus the most helpful / most harmful items by influence on the
    PREDICTED class (what pushed this answer, what pushed against it).
    """
    from nwhead_tpu.nw.net import NWModel
    from nwhead_tpu.ops.influence import support_influence

    # Bank row -> support-dataset identity. Valid only while the bank is in
    # canonical precompute order — incremental add/remove re-orders it and
    # clears the flag (length alone is not a safe guard: an equal-size
    # add-then-remove would silently mis-attribute every explanation).
    bank_to_ds = np.concatenate(net.support_eval.full_bank_indices)
    if (not getattr(net.support_eval, "bank_is_canonical", False)
            or len(bank_to_ds) != len(np.asarray(net.full_y))):
        bank_to_ds = None
    spaths = getattr(train_ds, "paths", None)
    sy_np = np.asarray(net.full_y)

    # The bank rides as a jit ARGUMENT (closing over it would inline it as
    # HLO constants — the remote compile service rejects big bodies).
    pw_fn = jax.jit(
        lambda v, qf, sf, sy: net.model.apply(
            v, qf, sf, sy, method=NWModel.head_probs_and_weights
        )
    )
    sy32 = jnp.asarray(net.full_y, dtype=jnp.int32)

    def item(row, value, key):
        d = {"support_index": int(row), "label": int(sy_np[row]),
             key: round(float(value), 6)}
        if bank_to_ds is not None:
            ds_idx = int(bank_to_ds[row])
            d["dataset_index"] = ds_idx
            if spaths is not None:
                d["path"] = str(spaths[ds_idx])
        return d

    def run(variables, imgs, k):
        qfeat = net._featurize_eval(variables, jnp.asarray(imgs))
        probs, weights = pw_fn(variables, qfeat, net.full_feat, sy32)
        probs = np.asarray(probs)
        weights = np.asarray(weights)
        pred = probs.argmax(axis=-1)
        # Leave-one-out influence on the predicted class: positive means
        # the item pushed TOWARD this answer (removing it would hurt).
        infl = np.asarray(support_influence(
            jnp.asarray(probs), jnp.asarray(pred), jnp.asarray(weights), sy32
        ))
        out = []
        for b in range(len(probs)):
            by_weight = np.argsort(-weights[b])[:k]
            # Only genuinely helpful items (influence > 0, i.e. label ==
            # predicted class) — a plain top-K would pad with least-bad
            # opposing items when K exceeds the positive count.
            by_help = [int(r) for r in np.argsort(-infl[b])[:k]
                       if infl[b][r] > 0]
            harmful = int(np.argmin(infl[b]))
            entry = {
                "predicted_class": int(pred[b]),
                "neighbors": [item(r, weights[b][r], "weight")
                              for r in by_weight],
                "helpful": [item(r, infl[b][r], "influence")
                            for r in by_help],
            }
            if infl[b][harmful] < 0:
                entry["most_harmful"] = item(harmful, infl[b][harmful],
                                             "influence")
            out.append(entry)
        # The head's exact output is log(probs + 1e-12) (nw.py:289) — one
        # featurizer pass serves both the answer and its explanation.
        return np.log(probs + 1e-12), out

    return run


def main(argv=None):
    p = argparse.ArgumentParser(description="NW Head Serving (TPU)")
    p.add_argument("--dataset", required=True)
    p.add_argument("--data_dir", default="./")
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--pretrained_path", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--kernel_type", default="euclidean")
    p.add_argument("--proj_dim", type=int, default=0)
    p.add_argument("--n_shot_full", type=int, default=100)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--head_precision", default="f32",
                   choices=["f32", "bf16", "int8", "int4"])
    p.add_argument("--featurizer_precision", default="f32",
                   choices=["f32", "int8", "bf16_fused"])
    p.add_argument("--calib_images", type=int, default=256)
    p.add_argument("--fused_inference", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--decoder", default="native_fused",
                   choices=["native", "native_fused", "pil"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bank_cache", default=None,
                   help="directory to save/restore the featurized support "
                        "bank (server restarts skip the featurizer pass); "
                        "tagged with arch/ckpt/precision and refused on "
                        "mismatch")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve over HTTP on PORT (0 = ephemeral): "
                        "/predict via the MicroBatcher, /add_support + "
                        "/remove_support live bank edits, /healthz, "
                        "/stats — stdlib only, see utils/httpd.py")
    p.add_argument("--http_host", default="127.0.0.1")
    p.add_argument("--serve_mode", default="full", choices=["full", "ivf"],
                   help="head per request: 'full' streams the whole "
                        "prepared bank (exact); 'ivf' routes each batch to "
                        "its top tiles and streams only those — bank DMA "
                        "scales with the batch's class skew (measured up "
                        "to ~16x at 1M rows, 1.000 top-1 agreement)")
    p.add_argument("--ivf_probe", type=lambda v: v if v == "auto" else int(v), default=32,
                   help="--serve_mode ivf: routed tiles per query before "
                        "the batch union (recall knob; >= the bank's tile "
                        "count reproduces full mode exactly). 'auto' "
                        "calibrates n_probe+group against the exact head "
                        "on a val sample (net.calibrate_ivf)")
    p.add_argument("--ivf_group", type=int, default=None,
                   help="--serve_mode ivf: grouped routing — route-sort "
                        "each batch and give every IVF_GROUP-query block "
                        "its own tile union (cuts DMA+compute on DIVERSE "
                        "batches; default one union per batch, best for "
                        "skewed traffic)")
    p.add_argument("--latency_bench", action="store_true")
    p.add_argument("--microbatch_bench", action="store_true",
                   help="request-at-a-time serving through the dynamic "
                        "MicroBatcher: achieved qps + per-request latency "
                        "+ batch occupancy at --concurrency clients")
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--microbatch_wait_ms", type=float, default=5.0)
    p.add_argument("--jpeg_bench", action="store_true",
                   help="images-in->answers-out bench from JPEG bytes "
                        "(host decode pipelined with device inference)")
    p.add_argument("--bench_batches", type=int, default=50)
    p.add_argument("--queries", default=None,
                   help="glob of image files to classify")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="post-hoc calibration temperature for reported "
                        "query probabilities (fit offline via eval.py "
                        "--fit_temperature)")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--explain", type=int, default=0, metavar="K",
                   help="with --queries: attach per-query explanations "
                        "from the NW head's own weights — top-K support "
                        "items by softmax weight plus the most helpful/"
                        "harmful items by leave-one-out influence on the "
                        "predicted class (the reference's interpretability "
                        "story, served per request). NOTE: explained "
                        "answers go through the exact f32 raw head (the "
                        "prepared int8/bf16 serving bank is bypassed), so "
                        "probabilities can differ slightly from the "
                        "unexplained serving path under --head_precision "
                        "int8/bf16")
    p.add_argument("--mesh", type=str, default=None,
                   help="'N_DATA,N_SUPPORT[,N_MODEL]' device mesh for "
                        "pod serving: the support bank shards over "
                        "'support' and every request runs the distributed "
                        "online-softmax merge (batch size must be "
                        "divisible by N_DATA)")
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"],
                   help="force the JAX backend; 'cpu' keeps the CLI "
                        "usable when the TPU tunnel is down (the axon "
                        "jaxlib ignores JAX_PLATFORMS; a hung tunnel "
                        "blocks backend init)")
    p.add_argument("--export_artifact", default=None, metavar="DIR",
                   help="build the server, AOT-export the one-dispatch "
                        "serving fn (jax.export StableHLO + operand "
                        "arrays) to DIR, and exit; serve it later with "
                        "--serve_artifact DIR (no model code / dataset / "
                        "precompute needed at load)")
    p.add_argument("--serve_artifact", default=None, metavar="DIR",
                   help="serve from an AOT artifact exported by "
                        "--export_artifact instead of building the model; "
                        "supports --latency_bench and --queries")
    args = p.parse_args(argv)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.serve_artifact:
        return artifact_serve(args)

    if not (args.latency_bench or args.jpeg_bench or args.queries
            or args.microbatch_bench or args.export_artifact
            or args.http is not None):
        raise SystemExit("pass --latency_bench, --microbatch_bench, "
                         "--jpeg_bench, --queries, --http and/or "
                         "--export_artifact")

    net, variables, train_ds, val_ds = build_server(args)
    if args.export_artifact:
        return export_artifact(net, variables, train_ds, val_ds, args)
    if args.http is not None:
        return http_serve(net, variables, train_ds, val_ds, args)
    out = {}
    if args.latency_bench:
        out["latency"] = latency_bench(net, variables, val_ds, args)
    if args.microbatch_bench:
        out["microbatch"] = microbatch_bench(net, variables, val_ds, args)
    if args.jpeg_bench:
        out["jpeg"] = jpeg_bench(net, variables, train_ds, args)
    if args.queries:
        # With --jpeg_bench the same files serve as the bench input set;
        # the user still gets the classifications they asked for.
        out["queries"] = answer_queries(net, variables, train_ds, args)
    return out


if __name__ == "__main__":
    main()
