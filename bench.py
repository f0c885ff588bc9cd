"""Headline benchmark: ResNet-152 frame-feature extraction throughput.

Runs on the default platform (the real TPU chip under the driver). Measures
steady-state frames/sec through the jitted bf16 NHWC extractor -- the
reference pipeline's dominant preprocessing cost (extract_frame_feature.py)
and the BASELINE.md north-star metric (target: >= 5000 frames/sec/chip).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N/5000}
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.models.resnet import init_random_params, make_extractor

BASELINE_FPS = 5000.0


def bench_resnet152(batch_size: int = 128, iters: int = 40,
                    warmup: int = 4) -> float:
    params = init_random_params()
    extract = make_extractor(params, batch_size)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3),
                                     np.uint8))
    _ = np.asarray(extract(images)[0])   # compile + drain
    for _ in range(warmup):
        out = extract(images)
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = extract(images)
    # fetch a single row: block_until_ready is unreliable over the axon
    # tunnel; a tiny device->host read forces the queue to drain
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def bench_train_step(iters: int = 10, batch_size: int = 0,
                     dtype: str = "", rng_impl: str = "") -> float:
    """Posts/sec through the full jitted accumulating train step at the
    bin/instance.sh recipe scale (transformers+ph+cl, common dim 1024,
    batch 8 x accum 8). batch_size overrides the recipe's microbatch to
    measure the scaling headroom (the recipe model is memory-bound at
    batch 8 by parity, not MXU-bound); dtype='bfloat16' measures the
    --dtype bfloat16 TPU-extension mode (f32 is the parity default)."""
    import __graft_entry__ as g
    from fancyrec_tpu.train.state import init_state, make_optimizer
    from fancyrec_tpu.train.step import make_train_step, stack_microbatches

    cfg = g._flagship_cfg()
    cfg.queue_size = 512   # queue size doesn't affect step cost materially
    if batch_size:
        cfg.batch_size = batch_size
    if dtype:
        cfg.dtype = dtype
    if rng_impl:
        cfg.rng_impl = rng_impl
    cfg = cfg.finalize()
    model, state = init_state(cfg)
    tx = make_optimizer(cfg)
    step = make_train_step(model, cfg, tx)
    rng = np.random.RandomState(0)
    micro = [g._example_batch(cfg, cfg.batch_size, rng)
             for _ in range(cfg.accumulation_step)]
    sb = jax.device_put(stack_microbatches(
        [{k: np.asarray(v) for k, v in m.items()} for m in micro]))
    state, metrics = step(state, sb)     # compile
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, sb)
    _ = float(metrics["loss"])           # forces the queue to drain
    dt = time.perf_counter() - t0
    posts = cfg.batch_size * cfg.accumulation_step * iters
    return posts / dt


def bench_train_resident(n_super: int = 0, iters: int = 4,
                         batch_size: int = 0, dtype: str = "",
                         rng_impl: str = "", remat: bool = False) -> dict:
    """Train-step throughput with data already resident in HBM: n_super
    recipe-scale super-batches are staged on device once, then a single
    jitted lax.scan consumes all of them per call (one dispatch -- no
    host->device transfer and no per-step tunnel RTT inside the timed
    region). Isolates the pure pipeline cost from the tunnel-bound
    host->device bandwidth that dominates the full-loop number, and
    reports an MFU estimate from XLA's own cost analysis against the
    v5e bf16 peak (197 TFLOP/s; f32 ops run below that peak, so the
    figure is conservative for the default f32 config)."""
    import __graft_entry__ as g
    from fancyrec_tpu.train.state import init_state, make_optimizer
    from fancyrec_tpu.train.step import make_train_step, stack_microbatches

    cfg = g._flagship_cfg()
    cfg.queue_size = 512
    if batch_size:
        cfg.batch_size = batch_size
        cfg.accumulation_step = max(1, 64 // batch_size)
    if dtype:
        cfg.dtype = dtype
    if rng_impl:
        cfg.rng_impl = rng_impl
    cfg.bert_remat = remat
    cfg = cfg.finalize()
    if not n_super:
        # keep ~512 posts staged regardless of batch: b1024 at the old
        # n_super=8 default staged 2.1 GB of frames and OOM'd the v5e
        n_super = max(1, 512 // (cfg.batch_size * cfg.accumulation_step))
    model, state = init_state(cfg)
    tx = make_optimizer(cfg)
    step = make_train_step(model, cfg, tx)

    rng = np.random.RandomState(0)
    supers = []
    for _ in range(n_super):
        micro = [g._example_batch(cfg, cfg.batch_size, rng)
                 for _ in range(cfg.accumulation_step)]
        supers.append(stack_microbatches(
            [{k: np.asarray(v) for k, v in m.items()} for m in micro]))
    stack = jax.device_put(
        {k: np.stack([s[k] for s in supers]) for k in supers[0]})

    def body(st, sb):
        st, metrics = step(st, sb)
        return st, metrics["loss"]

    epoch = jax.jit(lambda st, sk: jax.lax.scan(body, st, sk))
    lowered = epoch.lower(state, stack)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    # XLA's cost_analysis counts a lax.scan body ONCE, not x trip count
    # (measured on this jaxlib: flops identical for n_super 1/2/8 over
    # the same body). The epoch nests two scans -- supers here and the
    # accumulation-microbatch scan inside step -- so the raw figure is
    # ~one microbatch's flops; scale by both trip counts. (The once-per-
    # super optimizer update gets over-counted by accum, but it is
    # elementwise -- <0.1% of a microbatch's matmul flops.) Rounds 1-4
    # under-reported device-resident TFLOP/s and MFU by exactly this
    # n_super*accum factor: the corrected b64 bf16 figure is ~35% MFU,
    # not 4.2%.
    flops_per_epoch = (float(cost.get("flops", 0.0))
                       * n_super * cfg.accumulation_step)

    state, losses = epoch(state, stack)          # warm
    _ = np.asarray(losses)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = epoch(state, stack)
    _ = np.asarray(losses)                       # drain via tiny fetch
    dt = time.perf_counter() - t0
    posts = cfg.batch_size * cfg.accumulation_step * n_super * iters
    flops_per_sec = flops_per_epoch * iters / dt if flops_per_epoch else 0.0
    return {"posts_per_sec": posts / dt,
            "tflops_per_sec": flops_per_sec / 1e12,
            "mfu_vs_bf16_peak": flops_per_sec / 197e12}


def bench_train_bucketed(n_posts: int = 1024, iters: int = 3,
                         dtype: str = "", batch_size: int = 0,
                         rng_impl: str = "") -> dict:
    """Train throughput with length-grouped batches + bucketed padding vs
    the static max pad, on an insCar-like length mix (~90% single-frame
    image posts, ~10% videos up to max_frames; reference constant
    VIDEO_MAX_LEN=64, util/constant.py -- image posts still pad to 64).

    Both arms consume the SAME posts pre-staged in HBM (no tunnel
    transfer in the timed region): the bucketed arm sorts posts into
    length-homogeneous batches (--length_grouped window mode) and slices
    each super-batch to its covering bucket (--token_buckets /
    --frame_buckets), stepping through one compiled program per bucket
    shape; the static arm steps the same posts at the full
    (max_frames, max_tokens) pad. Host->device savings (frames shrink
    up to 64x) come on top of the reported device-side speedup."""
    import __graft_entry__ as g
    from fancyrec_tpu.data.loader import bucket_batch
    from fancyrec_tpu.train.state import init_state, make_optimizer
    from fancyrec_tpu.train.step import make_train_step, stack_microbatches

    cfg = g._flagship_cfg()
    cfg.queue_size = 512
    if dtype:
        cfg.dtype = dtype
    if batch_size:
        cfg.batch_size = batch_size
        cfg.accumulation_step = max(1, 64 // batch_size)
    if rng_impl:
        cfg.rng_impl = rng_impl
    cfg = cfg.finalize()
    b, a = cfg.batch_size, cfg.accumulation_step
    n_posts -= n_posts % (b * a)

    rng = np.random.RandomState(0)
    flen = np.where(rng.rand(n_posts) < 0.9, 1,
                    rng.randint(2, cfg.max_frames + 1, n_posts))
    tlen = np.clip(rng.lognormal(2.7, 0.6, n_posts).astype(np.int64),
                   3, cfg.max_tokens)

    def make_post(i):
        mb = {k: np.array(v) for k, v in g._example_batch(cfg, 1, rng).items()}
        mb["vmask"][0, :] = np.arange(cfg.max_frames) < flen[i]
        mb["tmask"][0, :] = np.arange(cfg.max_tokens) < tlen[i]
        mb["tokens"] *= mb["tmask"]
        mb["frames"] *= mb["vmask"][:, :, None]
        return mb

    posts = [make_post(i) for i in range(n_posts)]

    def build(order, buckets):
        supers = []
        for s in range(0, n_posts, b * a):
            micro = [
                {k: np.concatenate([posts[j][k] for j in
                                    order[t: t + b]]) for k in posts[0]}
                for t in range(s, s + b * a, b)]
            sb = stack_microbatches(micro)
            if buckets:
                sb = bucket_batch(sb, token_buckets=[16, 32, 64, 128],
                                  frame_buckets=[1, 4, 16, 64])
            supers.append(sb)
        return supers

    grouped = np.argsort(flen * (cfg.max_tokens + 1) + tlen, kind="stable")
    arms = {"static_pad": build(np.arange(n_posts), False),
            "bucketed": build(grouped, True)}

    out = {}
    for name, supers in arms.items():
        model, state = init_state(cfg)
        step = make_train_step(model, cfg, make_optimizer(cfg))
        dev = [jax.device_put(sb) for sb in supers]
        for sb in {tuple(x["frames"].shape) + tuple(x["tokens"].shape): x
                   for x in dev}.values():
            state, metrics = step(state, sb)     # compile each shape
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            for sb in dev:
                state, metrics = step(state, sb)
        _ = float(metrics["loss"])
        out[name + "_posts_per_sec"] = n_posts * iters / (
            time.perf_counter() - t0)
    out["speedup"] = (out["bucketed_posts_per_sec"]
                      / out["static_pad_posts_per_sec"])
    out["n_posts"] = n_posts
    return out


def bench_retrieval(n_posts: int = 1_000_000, dim: int = 1024,
                    k: int = 10, quantize: str = "") -> float:
    """Posts/sec through the streaming top-k retrieval (51-brand query).
    quantize='int8' pre-quantizes the index (per-row max-abs) and scores
    int8 x int8 -> int32 on the MXU: 4x less HBM on the memory-bound
    query. quantize='int8_fused' adds the Pallas fused score+top-k kernel
    (VMEM-resident selection -- the (B, N) score matrix never touches
    HBM)."""
    from fancyrec_tpu.ops.similarity import (
        quantize_rows_int8, retrieval_topk, retrieval_topk_fused_int8)

    # generate on device: a (n_posts, dim) host->device transfer over the
    # tunneled chip would dominate the measurement
    key = jax.random.PRNGKey(0)
    brands = jax.random.normal(key, (51, dim), jnp.float32)
    posts = jax.random.normal(key, (n_posts, dim), jnp.float32)
    inv = None
    if quantize.startswith("int8"):
        posts, inv = jax.jit(quantize_rows_int8)(posts)
    if quantize == "int8_fused":
        n_pad = n_posts - n_posts % 8192
        posts, inv = posts[:n_pad], inv[:n_pad]   # pre-padded staging
        n_posts = n_pad
        f = jax.jit(lambda b, p, i: retrieval_topk_fused_int8(
            b, p, i, k, block=8192))
    else:
        f = jax.jit(lambda b, p, i: retrieval_topk(b, p, k, block=4096,
                                                   posts_inv=i))
    _ = np.asarray(f(brands, posts, inv)[0])  # compile + drain
    # 100 iters: at 10 the tunnel's per-call dispatch floor dominated the
    # few-ms kernels (6.8 ms/iter apparent vs 4.0 ms true device time for
    # the same int8 program in a same-session A/B) -- the round-1..4
    # retrieval rows carry that inflation; CLAUDE.md round-2 "dispatch
    # floor"
    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(brands, posts, inv)
    _ = np.asarray(out[0])               # (51, k) fetch forces completion
    # steady-state: amortizes the tunnel RTT that a single shot eats whole
    return n_posts * iters / (time.perf_counter() - t0)


def bench_ivf(n_posts: int = 1_000_000, dim: int = 1024, k: int = 10,
              nlist: int = 2048, nprobe: int = 64, iters: int = 200) -> dict:
    """Single-query latency: exact int8 brute force vs the IVF-Flat ANN
    sidecar at 1M x 1024 (both device-resident, amortized over `iters`
    calls -- the tunnel RTT would otherwise swamp the kernel time).
    Exact reads the whole 1 GB index per query; IVF probes nprobe/nlist
    of it. Also reports measured recall@k of IVF against exact on the
    same queries. Posts are generated on-device (a 4 GB host->device
    transfer would dominate) and the IVF build itself runs on-device
    (serving/ivf.py packs in HBM)."""
    from fancyrec_tpu.ops.similarity import quantize_rows_int8, retrieval_topk
    from fancyrec_tpu.serving.ivf import IVFIndex

    # clustered corpus (1024 latent topics + noise): isotropic gaussians
    # in 1024-d have NO neighbor structure -- every cluster is equidistant
    # and IVF recall collapses to nprobe/nlist by construction. Real post
    # embeddings are brand/topic-clustered, which is the regime ANN
    # serves; queries sit near topic centers like brand embeddings do.
    # Built by broadcast, not centers[labels]: a 1M-row gather runs at
    # per-row overhead on TPU (~6 min for 4 GB) and the lazy value would
    # otherwise be forced inside the timed build.
    k1, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 3)
    nc = 1024
    per = n_posts // nc
    n_posts = nc * per
    centers = jax.random.normal(k1, (nc, dim), jnp.float32)
    if n_posts <= 1_000_000:
        posts = (centers[:, None, :]
                 + 0.5 * jax.random.normal(k3, (nc, per, dim), jnp.float32)
                 ).reshape(n_posts, dim)
        _ = np.asarray(posts[0, :1])  # force datagen outside the timed build
        t0 = time.perf_counter()
        ivf = IVFIndex.build(posts, nlist=nlist, iters=10, quantize="int8")
        _ = np.asarray(ivf.packed_idx[0, :1])
        build_s = time.perf_counter() - t0
        q8, qinv = jax.jit(quantize_rows_int8)(posts)
        del posts
    else:
        # beyond 1M the f32 corpus exceeds HBM (4M x 1024 = 16 GB):
        # stream center-aligned chunks through the memory-lean
        # build_chunked path (the same code fancyrec-index ivf-build
        # uses) and assemble the exact-path int8 copy chunkwise too
        from functools import partial
        cpb = 64                                   # centers per chunk
        chunk = per * cpb

        def gen(lo, hi):
            # noise keyed per CENTER, not per chunk: every caller grid
            # (the k-means sample stride, the scatter chunks, the exact
            # copy) must see the same corpus rows for the same indices
            c0, c1 = lo // per, -(-hi // per)
            noise = jax.vmap(lambda c: jax.random.normal(
                jax.random.fold_in(k3, c), (per, dim), jnp.float32)
            )(jnp.arange(c0, c1))
            rows = (centers[c0:c1, None, :] + 0.5 * noise).reshape(-1, dim)
            return rows[lo - c0 * per: hi - c0 * per]

        t0 = time.perf_counter()
        ivf = IVFIndex.build_chunked(gen, n_posts, dim, nlist=nlist,
                                     iters=10, quantize="int8", chunk=chunk)
        _ = np.asarray(ivf.packed_idx[0, :1])
        build_s = time.perf_counter() - t0

        @partial(jax.jit, donate_argnums=0)
        def put_chunk(buf, rows, lo):
            q, i = quantize_rows_int8(rows)
            return jax.lax.dynamic_update_slice(buf, q, (lo, 0)), i

        q8 = jnp.zeros((n_posts, dim), jnp.int8)
        inv_host = np.zeros(n_posts, np.float32)
        for lo in range(0, n_posts, chunk):
            q8, i = put_chunk(q8, gen(lo, lo + chunk), lo)
            inv_host[lo: lo + chunk] = np.asarray(i)
        qinv = jnp.asarray(inv_host)
    queries = (centers[jax.random.randint(k4, (8,), 0, 1024)]
               + 0.5 * jax.random.normal(k4, (8, dim), jnp.float32))
    exact_fn = jax.jit(lambda q, p, i: retrieval_topk(
        q, p, k, block=4096, posts_inv=i))

    def drain(x):
        _ = np.asarray(x[0][:1])

    # exact single query (amortized)
    q1 = queries[:1]
    drain(exact_fn(q1, q8, qinv))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = exact_fn(q1, q8, qinv)
    drain(out)
    exact_ms = (time.perf_counter() - t0) / iters * 1e3

    _, e_idx = exact_fn(queries, q8, qinv)
    e_idx = np.asarray(e_idx)

    def probe_point(npb, mode="cosine"):
        """(latency, recall) at one nprobe over the shared build.
        mode="cosine" is the production default (the 4M A/B pinned it,
        serving/ivf.py class docstring); "bound" rides along in the
        at-scale curve so the A/B stays auditable per run."""
        npb = min(npb, nlist)   # query() clamps; this path bypasses it
        fn = ivf._jitted_query(1, k, npb, mode)
        args = (q1, ivf.packed, ivf.packed_idx, ivf.centroids,
                ivf.inv_norms,
                ivf.radii if mode == "bound" else None)
        drain(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        drain(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        _, i_idx = ivf.query(np.asarray(queries), k=k, nprobe=npb,
                             probe=mode)
        i_idx = np.asarray(i_idx)
        recall = np.mean([len(set(e_idx[i]) & set(i_idx[i])) / k
                          for i in range(len(e_idx))])
        return ms, float(recall)

    # labels must reflect the probe count that actually ran: probe_point
    # clamps to nlist, so clamp the reported keys identically and drop
    # duplicate clamped points
    nprobe = min(nprobe, nlist)
    ivf_ms, recall = probe_point(nprobe)
    result = {"n_posts": n_posts, "nlist": nlist, "nprobe": nprobe,
              "build_s": build_s, "exact_single_query_ms": exact_ms,
              "ivf_single_query_ms": ivf_ms,
              "spill_frac": getattr(ivf, "spill_frac", None),
              "speedup": exact_ms / ivf_ms, "recall_at_%d" % k: float(recall)}
    if n_posts > 1_000_000:
        # at scale the interesting artifact is the recall/latency curve
        # (a finer centroid grid needs more probes for the same recall)
        # with the cosine-vs-bound probe A/B riding along at each point
        points = sorted({min(nprobe * m, nlist) for m in (1, 2, 4, 8)})
        curve = {}
        for npb in points:
            ms, rec = probe_point(npb)
            entry = {"ms": ms, "recall": rec}
            if ivf.radii is not None:
                ms_b, rec_b = probe_point(npb, mode="bound")
                entry.update(ms_bound=ms_b, recall_bound=rec_b)
            curve[str(npb)] = entry
        result["nprobe_curve"] = curve
    return result


def _synthetic_index_dir(tmp: str, n_posts: int, dim: int) -> str:
    """Write a minimal on-disk index whose resident posts get swapped for
    a device-generated synthetic corpus (a 4 GB host->device transfer
    over the tunnel would swamp any measurement)."""
    from fancyrec_tpu.io.bigfile import BigFileWriter

    idx_dir = os.path.join(tmp, "idx")
    rng = np.random.RandomState(0)
    with BigFileWriter(idx_dir, ndims=dim, delimiter="\t") as w:
        w.write_batch(["seed%d" % i for i in range(8)],
                      rng.randn(8, dim).astype(np.float32))
    np.save(os.path.join(idx_dir, "brands.npy"), np.zeros(8, np.int32))
    np.save(os.path.join(idx_dir, "brand_embeddings.npy"),
            rng.randn(51, dim).astype(np.float32))
    with open(os.path.join(idx_dir, "index_meta.json"), "w") as f:
        f.write(json.dumps({"collection": "bench", "checkpoint": "none",
                            "brand_num": 51, "dim": dim,
                            "n_posts": n_posts}))
    return idx_dir


def _swap_synthetic_posts(index, n_posts: int, dim: int, quantize: str):
    key = jax.random.PRNGKey(0)
    posts = jax.random.normal(key, (n_posts, dim), jnp.float32)
    index.n_posts = n_posts
    if quantize == "int8":
        from fancyrec_tpu.ops.similarity import quantize_rows_int8
        from fancyrec_tpu.serving.index import _FUSED_BLOCK
        q, inv = jax.jit(quantize_rows_int8)(posts)
        # pad the staged rows like PostIndex.posts() does, so the fused
        # Pallas gate engages on TPU (pad rows masked via n_valid)
        pad = (-n_posts) % _FUSED_BLOCK if index._fused_eligible() else 0
        if pad:
            q = jnp.pad(q, ((0, pad), (0, 0)))
            inv = jnp.pad(inv, (0, pad))
        index._posts, index._posts_inv = q, inv
    else:
        index._posts = posts
    index.cap_ids = ["p%d" % i for i in range(n_posts)]


def bench_serving(n_posts: int = 1_000_000, dim: int = 1024, k: int = 10,
                  iters: int = 20, quantize: str = "") -> dict:
    """End-to-end PostIndex.query latency at 1M posts: the jit-cached
    streaming top-k plus host-side id mapping. Posts are generated on
    device; the on-disk plumbing is covered by tests."""
    import tempfile

    from fancyrec_tpu.serving.index import PostIndex

    with tempfile.TemporaryDirectory() as tmp:
        idx_dir = _synthetic_index_dir(tmp, n_posts, dim)
        index = PostIndex(idx_dir, device_resident=False, quantize=quantize)
        _swap_synthetic_posts(index, n_posts, dim, quantize)

        _ = index.query(list(range(51)), k=k)      # compile + cache
        t0 = time.perf_counter()
        for _ in range(iters):
            vals, names = index.query(list(range(51)), k=k)
        dt = (time.perf_counter() - t0) / iters
    return {"query_latency_ms": dt * 1e3, "n_posts": n_posts, "k": k}


def bench_serving_concurrent(n_posts: int = 1_000_000, dim: int = 1024,
                             k: int = 10, clients: int = 8,
                             reqs_per_client: int = 12,
                             quantize: str = "int8") -> dict:
    """p50/p99 of /v1/topk under concurrent load, coalescing OFF vs ON,
    through the real HTTP server over sockets (VERDICT r3 #5's measured
    number). `clients` threads each fire `reqs_per_client` sequential
    all-brand queries; latency is client-observed wall time per request.
    With coalescing off every request serializes behind the device lock
    (p99 ~= clients x single-query latency); with it on, pending requests
    merge into one padded batched kernel call."""
    import http.client
    import tempfile
    import threading

    from fancyrec_tpu.serving.server import FancyRecService, make_server

    def load_pass(service) -> dict:
        server = make_server(service, port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.server_port
        body = json.dumps({"brand_ids": list(range(51)), "k": k})
        lats, errs = [], []
        lock = threading.Lock()

        def client():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            mine = []
            try:
                for _ in range(reqs_per_client):
                    t0 = time.perf_counter()
                    conn.request("POST", "/v1/topk", body,
                                 {"Content-Type": "application/json"})
                    resp = conn.getresponse()
                    resp.read()
                    mine.append((time.perf_counter() - t0) * 1e3)
                    if resp.status != 200:
                        errs.append(resp.status)
            finally:
                conn.close()
            with lock:
                lats.extend(mine)

        try:
            # warm: compile the lone-leader (51-row) and the coalesced
            # padded shapes outside the timed window
            for ids_n in (51, 128, 256):
                ids = [i % 51 for i in range(ids_n)]
                service.index.query(ids, k=k)
            threads = [threading.Thread(target=client)
                       for _ in range(clients)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
        finally:
            server.shutdown()
            thread.join(timeout=10)
        assert not errs, errs
        lats.sort()
        q = lambda p: lats[min(int(p * len(lats)), len(lats) - 1)]
        out = {"p50_ms": q(0.50), "p99_ms": q(0.99),
               "req_per_sec": len(lats) / wall}
        if service._coalescer is not None:
            out.update(service._coalescer.snapshot())
        return out

    with tempfile.TemporaryDirectory() as tmp:
        idx_dir = _synthetic_index_dir(tmp, n_posts, dim)
        results = {}
        for name, coalesce in (("serial_lock", False), ("coalesced", True)):
            service = FancyRecService(idx_dir, device_resident=False,
                                      quantize=quantize, coalesce=coalesce)
            _swap_synthetic_posts(service.index, n_posts, dim, quantize)
            results[name] = load_pass(service)
    results["p99_speedup"] = (results["serial_lock"]["p99_ms"]
                              / results["coalesced"]["p99_ms"])
    results["clients"] = clients
    results["n_posts"] = n_posts
    return results


def bench_eval(n_posts: int = 4096, iters: int = 8) -> dict:
    """Full-eval wall time at recipe dims: encode every post through the
    jitted eval forward (batch 128), then brands x posts ranking metrics.
    Returns posts/sec encode throughput and the metric-kernel time."""
    import __graft_entry__ as g
    from fancyrec_tpu.eval.evaluator import make_encode_fn
    from fancyrec_tpu.eval.metrics import cosine_sim_matrix, ranking_metrics_jax
    from fancyrec_tpu.models import FancyRec
    from fancyrec_tpu.train.state import init_state

    cfg = g._flagship_cfg()
    cfg.batch_size = 128
    model, state = init_state(cfg)
    encode = make_encode_fn(model)
    rng = np.random.RandomState(0)
    batch = {k: v for k, v in g._example_batch(cfg, cfg.batch_size, rng).items()}
    n_batches = n_posts // cfg.batch_size

    _ = np.asarray(encode(state.params, state.batch_stats, batch)[0])  # compile
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = encode(state.params, state.batch_stats, batch)
    _ = np.asarray(out[0])
    encode_dt = time.perf_counter() - t0

    # ranking metrics over the full index
    key = jax.random.PRNGKey(0)
    post_embs = jax.random.normal(key, (n_posts, cfg.common_embedding_size))
    brand_embs = jax.random.normal(key, (cfg.brand_num, cfg.common_embedding_size))
    brands = jax.random.randint(key, (n_posts,), 0, cfg.brand_num)
    metric_fn = jax.jit(lambda be, pe, br: ranking_metrics_jax(
        cosine_sim_matrix(be, pe), br, cfg.brand_num))
    _ = [float(x) for x in metric_fn(brand_embs, post_embs, brands)]  # compile
    # amortize over iters: a single shot over the axon tunnel measures the
    # ~250 ms RTT, not the kernel
    t0 = time.perf_counter()
    for _ in range(iters):
        m = metric_fn(brand_embs, post_embs, brands)
    _ = [float(x) for x in m]
    metric_dt = (time.perf_counter() - t0) / iters

    return {"encode_posts_per_sec": n_batches * cfg.batch_size / encode_dt,
            "metric_kernel_ms": metric_dt * 1e3,
            "n_posts": n_posts}


def bench_preprocess(n_videos: int = 8, frames_per_video: int = 450,
                     size=(640, 360), fps: int = 30, batch_size: int = 64,
                     workers: int = 2, extract_fn=None) -> dict:
    """End-to-end offline preprocess stage: mp4 decode -> sampled frames ->
    jitted ResNet-152 -> BigFile, with the decode thread(s) overlapping the
    TPU forward (the reference's heaviest offline stage,
    preprocess/preprocess_videos.py:36-62 + extract_frame_feature.py, which
    round-trips every frame through cv2.imwrite/jpg re-read; here the
    fused path feeds the extractor directly).

    Synthesizes n_videos mp4s (moving-gradient frames: realistic decode
    cost, fast to encode), then measures
      * decode_only_fps      -- serial decode floor on this host (no TPU)
      * e2e_decoded_fps      -- full fused pipeline, in decoded frames/s
      * e2e_sampled_fps      -- same, in sampled (=extracted) frames/s
      * tpu_starved_frac     -- fraction of wall the consumer sat waiting
                                on decode (1.0 == fully decode-bound)
      * overlap_speedup      -- (serial decode + extract + write) / wall
      * extractor_ceiling_fps-- what the TPU side alone sustains
    """
    import shutil
    import tempfile

    import cv2

    from fancyrec_tpu.preprocess import videos as V
    from fancyrec_tpu.preprocess.features import extract_features

    root = tempfile.mkdtemp(prefix="fancyrec_bench_pre_")
    try:
        yy, xx = np.mgrid[0:size[1], 0:size[0]]
        base = np.zeros((size[1], size[0], 3), np.uint8)
        base[..., 0] = (xx * 255 // size[0]).astype(np.uint8)
        base[..., 1] = (yy * 255 // size[1]).astype(np.uint8)
        for v in range(n_videos):
            d = os.path.join(root, "brand%02d" % (v % 4))
            os.makedirs(d, exist_ok=True)
            vw = cv2.VideoWriter(os.path.join(d, "vid%03d.mp4" % v),
                                 cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
            if not vw.isOpened():
                raise RuntimeError("mp4v codec unavailable")
            frame = base.copy()
            frame[..., 2] = (v * 37) % 255
            for i in range(frames_per_video):
                vw.write(np.roll(frame, i * 3, axis=1))
            vw.release()
        brands = sorted(d for d in os.listdir(root)
                        if os.path.isdir(os.path.join(root, d)))
        decoded = n_videos * frames_per_video

        # serial decode floor (no extraction)
        t0 = time.perf_counter()
        sampled = sum(1 for _ in V.iter_sampled_frames(root, brands))
        decode_s = time.perf_counter() - t0

        if extract_fn is None:
            params = init_random_params()
            extract_fn = make_extractor(params, batch_size)
        _ = np.asarray(extract_fn(
            np.zeros((batch_size, 224, 224, 3), np.uint8))[0])  # compile

        out_dir = os.path.join(root, "out")
        stats = {}
        t0 = time.perf_counter()
        n = extract_features(
            V.iter_sampled_frames_parallel(root, brands, workers=workers,
                                           backend="thread"),
            out_dir, batch_size=batch_size, extract_fn=extract_fn,
            stats=stats)
        wall = time.perf_counter() - t0
        assert n == sampled, (n, sampled)

        # same videos through the spawn process-pool decode (the multi-core
        # deploy-host path; on a 1-core box this mainly proves graceful
        # degradation -- the A/B the deploy note cites)
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        n_p = extract_features(
            V.iter_sampled_frames_parallel(
                root, brands, workers=max(workers, 2), backend="process"),
            out_dir, batch_size=batch_size, extract_fn=extract_fn)
        wall_procs = time.perf_counter() - t0
        assert n_p == sampled, (n_p, sampled)

        serial_estimate = decode_s + stats["compute_s"] + stats["write_s"]
        return {
            "n_videos": n_videos,
            "decoded_frames": decoded,
            "sampled_frames": sampled,
            "decode_only_fps": decoded / decode_s,
            "e2e_wall_s": wall,
            "e2e_decoded_fps": decoded / wall,
            "e2e_sampled_fps": sampled / wall,
            "e2e_decoded_fps_procs": decoded / wall_procs,
            "proc_pool_speedup": wall / wall_procs,
            "tpu_starved_frac": stats["wait_s"] / wall,
            "overlap_speedup": serial_estimate / wall,
            "extractor_ceiling_fps": (
                stats["batches"] * batch_size / stats["compute_s"]),
            "decode_workers": workers,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _line(metric, value, unit, vs_baseline=None, **extra):
    rec = {"metric": metric,
           "value": (round(value, 2) if isinstance(value, float)
                     else value),
           "unit": unit, "vs_baseline": vs_baseline}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _get(results, name, *keys):
    v = results.get(name)
    for k in keys:
        if not isinstance(v, dict):
            return None
        v = v.get(k)
    if isinstance(v, dict) and "error" in v:
        return None
    return v


def _bench_plan(artifact_path: str):
    """Ordered (name, runner, emitter) triples shared by `bench.py` (the
    driver's streaming end-of-round invocation) and `bench.py all`.

    ORDER MATTERS: the driver parses the FIRST printed JSON line into
    BENCH_r*.json and may kill the process on a timeout, so the headline
    resnet number runs first and each metric's line prints the moment its
    sub-bench completes (round 4 batched all the printing after the full
    suite and the driver's timeout blanked the round's artifact --
    VERDICT r4 #1). Cheap, high-signal benches lead; the slow multi-shape
    compile benches (bucketed) and host-bound preprocess trail."""
    def rr(d, nd=4):
        return {k: round(v, nd) if isinstance(v, float) else v
                for k, v in d.items()}

    def emit_resnet(r):
        fps = _get(r, "resnet152_fps")
        _line("resnet152_feature_extraction_throughput", fps,
              "frames/sec/chip",
              vs_baseline=(round(fps / BASELINE_FPS, 4)
                           if isinstance(fps, (int, float)) else None),
              artifact=artifact_path)

    def resident_emitter(key, metric, **flags):
        def emit(r):
            _line(metric, _get(r, key, "posts_per_sec"), "posts/sec/chip",
                  tflops_per_sec=_get(r, key, "tflops_per_sec"),
                  mfu_vs_bf16_peak=_get(r, key, "mfu_vs_bf16_peak"))
        return emit

    return [
        ("resnet152_fps", lambda: round(bench_resnet152(), 1), emit_resnet),
        ("train_step_posts_per_sec",
         lambda: round(bench_train_step(), 1),
         lambda r: _line("train_step_throughput_recipe_config",
                         _get(r, "train_step_posts_per_sec"),
                         "posts/sec/chip")),
        ("train_step_b64_bf16_posts_per_sec",
         lambda: round(bench_train_step(batch_size=64, dtype="bfloat16"), 1),
         lambda r: _line("train_step_throughput_recipe_config_b64_bf16",
                         _get(r, "train_step_b64_bf16_posts_per_sec"),
                         "posts/sec/chip")),
        ("train_resident",
         lambda: rr(bench_train_resident()),
         resident_emitter("train_resident",
                          "train_step_throughput_device_resident")),
        ("train_resident_b64_bf16",
         lambda: rr(bench_train_resident(batch_size=64, dtype="bfloat16")),
         resident_emitter("train_resident_b64_bf16",
                          "train_step_throughput_device_resident_b64_bf16")),
        ("train_resident_b256_bf16",
         lambda: rr(bench_train_resident(n_super=2, batch_size=256,
                                         dtype="bfloat16")),
         resident_emitter("train_resident_b256_bf16",
                          "train_step_throughput_device_resident_b256_bf16")),
        # b512 is the measured knee of the batch curve (34/37/39% MFU at
        # b64/b256/b512, 2026-08-20). No b1024 row: that step's
        # activation footprint OOMs the v5e even with a single staged
        # super-batch (bf16 1024x128x768 BERT temps) -- the curve's
        # saturation statement lives in README "Performance".
        ("train_resident_b512_bf16",
         lambda: rr(bench_train_resident(n_super=2, iters=8, batch_size=512,
                                         dtype="bfloat16")),
         resident_emitter("train_resident_b512_bf16",
                          "train_step_throughput_device_resident_b512_bf16")),
        ("retrieval_1m_mposts_per_sec",
         lambda: round(bench_retrieval() / 1e6, 2),
         lambda r: _line("retrieval_topk_1m_posts",
                         _get(r, "retrieval_1m_mposts_per_sec"),
                         "Mposts/sec/chip")),
        ("retrieval_1m_int8_mposts_per_sec",
         lambda: round(bench_retrieval(quantize="int8") / 1e6, 2),
         lambda r: _line("retrieval_topk_1m_posts_int8",
                         _get(r, "retrieval_1m_int8_mposts_per_sec"),
                         "Mposts/sec/chip")),
        ("retrieval_1m_int8_fused_mposts_per_sec",
         lambda: round(bench_retrieval(quantize="int8_fused") / 1e6, 2),
         lambda r: _line("retrieval_topk_1m_posts_int8_fused",
                         _get(r, "retrieval_1m_int8_fused_mposts_per_sec"),
                         "Mposts/sec/chip")),
        ("eval",
         lambda: {k: round(v, 2) for k, v in bench_eval().items()},
         lambda r: _line("eval_encode_throughput_recipe_config",
                         _get(r, "eval", "encode_posts_per_sec"),
                         "posts/sec/chip",
                         metric_kernel_ms=_get(r, "eval",
                                               "metric_kernel_ms"))),
        ("ivf_single_query",
         lambda: rr(bench_ivf()),
         lambda r: _line("ivf_single_query_latency_1m_posts",
                         _get(r, "ivf_single_query", "ivf_single_query_ms"),
                         "ms",
                         exact_single_query_ms=_get(
                             r, "ivf_single_query", "exact_single_query_ms"),
                         recall_at_10=_get(r, "ivf_single_query",
                                           "recall_at_10"))),
        ("serving_query_ms",
         lambda: round(bench_serving()["query_latency_ms"], 1),
         lambda r: _line("serving_query_latency_1m_posts",
                         _get(r, "serving_query_ms"), "ms")),
        ("serving_query_int8_ms",
         lambda: round(bench_serving(quantize="int8")["query_latency_ms"], 1),
         lambda r: _line("serving_query_latency_1m_posts_int8",
                         _get(r, "serving_query_int8_ms"), "ms")),
        ("serving_concurrent",
         lambda: {k: (rr(v, 2) if isinstance(v, dict)
                      else round(v, 3) if isinstance(v, float) else v)
                  for k, v in bench_serving_concurrent().items()},
         lambda r: _line("serving_concurrent_p99_8_clients",
                         _get(r, "serving_concurrent", "coalesced", "p99_ms"),
                         "ms",
                         serial_lock_p99_ms=_get(r, "serving_concurrent",
                                                 "serial_lock", "p99_ms"),
                         p99_speedup=_get(r, "serving_concurrent",
                                          "p99_speedup"))),
        ("train_bucketed",
         lambda: rr(bench_train_bucketed()),
         lambda r: _line("train_step_throughput_bucketed_inscar_mix",
                         _get(r, "train_bucketed", "bucketed_posts_per_sec"),
                         "posts/sec/chip",
                         speedup_vs_static_pad=_get(r, "train_bucketed",
                                                    "speedup"))),
        ("train_bucketed_b256_bf16_rbg",
         lambda: rr(bench_train_bucketed(batch_size=256, dtype="bfloat16",
                                         rng_impl="rbg")),
         lambda r: _line("train_step_throughput_bucketed_b256_bf16_rbg",
                         _get(r, "train_bucketed_b256_bf16_rbg",
                              "bucketed_posts_per_sec"), "posts/sec/chip",
                         speedup_vs_static_pad=_get(
                             r, "train_bucketed_b256_bf16_rbg", "speedup"))),
        ("preprocess_e2e",
         # workers=1: decode threads lose on this 1-core host (README)
         lambda: rr(bench_preprocess(n_videos=6, frames_per_video=300,
                                     workers=1)),
         lambda r: _line("preprocess_e2e_decoded_fps",
                         _get(r, "preprocess_e2e", "e2e_decoded_fps"),
                         "frames/sec",
                         sampled_fps=_get(r, "preprocess_e2e",
                                          "e2e_sampled_fps"),
                         decode_only_fps=_get(r, "preprocess_e2e",
                                              "decode_only_fps"),
                         tpu_starved_frac=_get(r, "preprocess_e2e",
                                               "tpu_starved_frac"),
                         overlap_speedup=_get(r, "preprocess_e2e",
                                              "overlap_speedup"),
                         decoded_fps_procs=_get(r, "preprocess_e2e",
                                                "e2e_decoded_fps_procs"),
                         proc_pool_speedup=_get(r, "preprocess_e2e",
                                                "proc_pool_speedup"))),
        # last by design: ~450 s chunked build + the dual-mode curve.
        # Under the driver's streaming budget this gets skipped; a full
        # `bench.py all` records the at-scale recall/latency curve with
        # the cosine-vs-bound probe A/B (VERDICT r4 #2)
        ("ivf_4m",
         lambda: rr(bench_ivf(n_posts=4_000_000, nlist=3968)),
         lambda r: _line("ivf_single_query_latency_4m_posts",
                         _get(r, "ivf_4m", "ivf_single_query_ms"), "ms",
                         exact_single_query_ms=_get(
                             r, "ivf_4m", "exact_single_query_ms"),
                         recall_at_10=_get(r, "ivf_4m", "recall_at_10"),
                         spill_frac=_get(r, "ivf_4m", "spill_frac"),
                         nprobe_curve=_get(r, "ivf_4m", "nprobe_curve"))),
    ]


def bench_all(out_path: str = "bench_full.json", budget_s: float = None,
              stream: bool = False) -> dict:
    """Run the sub-benchmark suite and write ONE machine-readable artifact
    so per-round perf claims are auditable (committed per round next to
    BENCH_r*.json). Keys mirror the individual subcommand metrics.

    stream=True (the driver's bare `python bench.py` path) prints each
    metric's one-line JSON record the moment its sub-bench completes and
    rewrites the artifact after every sub-bench, so a driver-side timeout
    still leaves a parsed headline + a valid artifact prefix.
    budget_s bounds total wall clock: sub-benches that have not STARTED
    when the budget expires are recorded as {"skipped": "budget"} with a
    stderr note (a running sub-bench is never interrupted)."""
    results = {}
    t_start = time.perf_counter()
    skipped = []
    artifact = {
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "results": results,
    }

    def write():
        with open(out_path, "w") as f:
            f.write(json.dumps(artifact, indent=2) + "\n")

    for name, runner, emitter in _bench_plan(out_path):
        elapsed = time.perf_counter() - t_start
        # the headline (first) sub-bench always runs: a too-small budget
        # must never reproduce round 4's empty artifact
        if budget_s is not None and elapsed > budget_s and results:
            results[name] = {"skipped": "budget"}
            skipped.append(name)
            continue
        t0 = time.perf_counter()
        try:
            results[name] = runner()
        except Exception as e:          # record, keep benching
            results[name] = {"error": "%s: %s" % (type(e).__name__, e)}
        print("[bench_all] %s done in %.1fs (total %.0fs)"
              % (name, time.perf_counter() - t0,
                 time.perf_counter() - t_start),
              file=sys.stderr, flush=True)
        if stream:
            emitter(results)
            write()
    if skipped:
        print("[bench_all] budget %.0fs exhausted; skipped: %s"
              % (budget_s, ", ".join(skipped)), file=sys.stderr, flush=True)
    if stream:
        _line("bench_suite_status",
              len(results) - len(skipped), "sub-benches completed",
              skipped=skipped,
              budget_s=budget_s,
              wall_s=round(time.perf_counter() - t_start, 1))
    write()
    return artifact


def main():
    args = sys.argv[1:]
    if not args:
        mode = "default"
    elif not args[0].isdigit():
        mode, args = args[0], args[1:]
    else:
        mode = "resnet"   # bare digits keep meaning `resnet <batch>`
    if mode == "default":
        # the driver's end-of-round invocation: run the suite STREAMING --
        # each sub-bench individually fenced (one failure never blanks the
        # round's artifact), each metric's JSON line printed the moment its
        # sub-bench completes (resnet first -- the driver parses the first
        # line), artifact rewritten after every sub-bench, and a wall-clock
        # budget after which un-started sub-benches are skipped with a note
        # (round 4's batched printing + driver timeout = empty artifact)
        # round 4's completed prefix alone took ~1300s and the driver's
        # timeout killed the run; the budget only gates sub-bench STARTS,
        # so leave headroom for the last-started one to finish
        budget = float(os.environ.get("FANCYREC_BENCH_BUDGET_S", "1200"))
        # the streaming run writes its OWN artifact: it rewrites the file
        # after every sub-bench, so a driver-side kill mid-suite must not
        # leave the committed full-suite artifact (bench_full.json, from
        # `bench.py all`) half-overwritten with {"skipped": ...} rows
        bench_all("bench_stream.json", budget_s=budget, stream=True)
    elif mode == "resnet":
        batch = int(args[0]) if args else 128
        fps = bench_resnet152(batch_size=batch)
        print(json.dumps({
            "metric": "resnet152_feature_extraction_throughput",
            "value": round(fps, 1),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / BASELINE_FPS, 4),
        }))
    elif mode == "train":
        batch, dtype, rng_impl = 0, "", ""
        for tok in args:
            if tok in ("bf16", "bfloat16"):
                dtype = "bfloat16"
            elif tok == "rbg":
                rng_impl = "rbg"
            else:
                batch = int(tok)   # raise loudly on typos
        pps = bench_train_step(batch_size=batch, dtype=dtype,
                               rng_impl=rng_impl)
        print(json.dumps({
            "metric": "train_step_throughput_recipe_config" + (
                "_b%d" % batch if batch else "") + (
                "_bf16" if dtype else "") + (
                "_rbg" if rng_impl else ""),
            "value": round(pps, 1), "unit": "posts/sec/chip",
            "vs_baseline": None,
        }))
    elif mode == "train_bucketed":
        batch, dtype, rng_impl = 0, "", ""
        for tok in args:
            if tok in ("bf16", "bfloat16"):
                dtype = "bfloat16"
            elif tok == "rbg":
                rng_impl = "rbg"
            else:
                batch = int(tok)
        r = bench_train_bucketed(dtype=dtype, batch_size=batch,
                                 rng_impl=rng_impl)
        print(json.dumps({
            "metric": "train_step_throughput_bucketed_inscar_mix" + (
                "_b%d" % batch if batch else "") + (
                "_bf16" if dtype else "") + ("_rbg" if rng_impl else ""),
            "value": round(r["bucketed_posts_per_sec"], 1),
            "unit": "posts/sec/chip", "vs_baseline": None,
            "static_pad_posts_per_sec": round(
                r["static_pad_posts_per_sec"], 1),
            "speedup": round(r["speedup"], 3),
        }))
    elif mode == "retrieval":
        quant = args[0] if args else ""
        pps = bench_retrieval(quantize=quant)
        print(json.dumps({
            "metric": "retrieval_topk_1m_posts" + ("_" + quant if quant else ""),
            "value": round(pps / 1e6, 2), "unit": "Mposts/sec/chip",
            "vs_baseline": None,
        }))
    elif mode == "train_resident":
        batch, dtype, rng_impl, remat = 0, "", "", False
        for tok in args:
            if tok in ("bf16", "bfloat16"):
                dtype = "bfloat16"
            elif tok == "rbg":
                rng_impl = "rbg"
            elif tok == "remat":
                remat = True
            else:
                batch = int(tok)
        r = bench_train_resident(batch_size=batch, dtype=dtype,
                                 rng_impl=rng_impl, remat=remat)
        print(json.dumps({
            "metric": "train_step_throughput_device_resident" + (
                "_b%d" % batch if batch else "") + ("_bf16" if dtype else "")
            + ("_rbg" if rng_impl else "") + ("_remat" if remat else ""),
            "value": round(r["posts_per_sec"], 1), "unit": "posts/sec/chip",
            "vs_baseline": None,
            "tflops_per_sec": round(r["tflops_per_sec"], 2),
            "mfu_vs_bf16_peak": round(r["mfu_vs_bf16_peak"], 4),
        }))
    elif mode == "ivf":
        n = int(args[0]) * 1_000_000 if args else 1_000_000
        nlist = (int(args[1]) if len(args) > 1
                 else 2048 if n <= 1_000_000
                 else int(2 * (n ** 0.5) // 64 * 64))
        r = bench_ivf(n_posts=n, nlist=nlist)
        print(json.dumps({
            "metric": "ivf_single_query_latency_%dm_posts" % (n // 1_000_000),
            "value": round(r["ivf_single_query_ms"], 2), "unit": "ms",
            "vs_baseline": None,
            "exact_single_query_ms": round(r["exact_single_query_ms"], 2),
            "speedup": round(r["speedup"], 2),
            "recall_at_10": round(r["recall_at_10"], 4),
            "build_s": round(r["build_s"], 1),
            "nlist": r["nlist"], "spill_frac": r["spill_frac"],
            **({"nprobe_curve": r["nprobe_curve"]}
               if "nprobe_curve" in r else {}),
        }))
    elif mode == "serving_concurrent":
        clients = int(args[0]) if args else 8
        r = bench_serving_concurrent(clients=clients)
        print(json.dumps({
            "metric": "serving_concurrent_p99_%d_clients" % clients,
            "value": round(r["coalesced"]["p99_ms"], 1), "unit": "ms",
            "vs_baseline": None,
            "coalesced_p50_ms": round(r["coalesced"]["p50_ms"], 1),
            "serial_lock_p50_ms": round(r["serial_lock"]["p50_ms"], 1),
            "serial_lock_p99_ms": round(r["serial_lock"]["p99_ms"], 1),
            "p99_speedup": round(r["p99_speedup"], 2),
            "req_per_sec": round(r["coalesced"]["req_per_sec"], 1),
            "device_calls": r["coalesced"].get("device_calls"),
            "requests": r["coalesced"].get("requests"),
        }))
    elif mode == "serving":
        quant = args[0] if args else ""
        r = bench_serving(quantize=quant)
        print(json.dumps({
            "metric": "serving_query_latency_1m_posts" + (
                "_int8" if quant else ""),
            "value": round(r["query_latency_ms"], 1), "unit": "ms",
            "vs_baseline": None, "k": r["k"],
        }))
    elif mode == "preprocess":
        n_videos = int(args[0]) if args else 8
        workers = int(args[1]) if len(args) > 1 else 2
        r = bench_preprocess(n_videos=n_videos, workers=workers)
        print(json.dumps({
            "metric": "preprocess_e2e_decoded_fps",
            "value": round(r["e2e_decoded_fps"], 1), "unit": "frames/sec",
            "vs_baseline": None,
            **{k: round(v, 4) if isinstance(v, float) else v
               for k, v in r.items() if k != "e2e_decoded_fps"},
        }))
    elif mode == "eval":
        r = bench_eval()
        print(json.dumps({
            "metric": "eval_encode_throughput_recipe_config",
            "value": round(r["encode_posts_per_sec"], 1),
            "unit": "posts/sec/chip",
            "vs_baseline": None,
            "metric_kernel_ms": round(r["metric_kernel_ms"], 1),
        }))
    elif mode == "all":
        out = args[0] if args else "bench_full.json"
        artifact = bench_all(out)
        fps = artifact["results"].get("resnet152_fps")
        print(json.dumps({
            "metric": "resnet152_feature_extraction_throughput",
            "value": fps, "unit": "frames/sec/chip",
            "vs_baseline": (round(fps / BASELINE_FPS, 4)
                            if isinstance(fps, (int, float)) else None),
            "artifact": out,
        }))
    else:
        raise SystemExit("usage: bench.py [resnet [batch]|train [batch]"
                         "|train_resident|train_bucketed [bf16]"
                         "|retrieval [int8]|eval|preprocess [n_videos [workers]]|ivf"
                         "|serving [int8]|serving_concurrent [clients]"
                         "|all [out.json]]; no args = full "
                         "suite, one JSON line per metric (resnet first)")


if __name__ == "__main__":
    main()
