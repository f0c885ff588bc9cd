"""Evaluation drivers: encode splits, rank posts, report metrics.

Mirrors reference evaluator.py:38-143 with the per-brand metric loop
replaced by the batched JAX kernel (fancyrec_tpu.eval.metrics)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.eval.metrics import (
    RankingMetrics, cosine_sim_matrix, ranking_metrics_jax,
    ranking_metrics_sharded)
from fancyrec_tpu.models.encoders import TextBatch, VisualBatch

# model-input keys of a batch dict; the rest (idxs, n_valid) is host-side
# scatter bookkeeping that never reaches the device
_MODEL_KEYS = ("brand_ids", "frames", "origin", "vmask", "bows", "tokens",
               "type_ids", "tmask")


def make_encode_fn(model):
    """Jitted eval forward over one batch -> (brand_ids, post_embs)."""

    @jax.jit
    def encode(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        v = VisualBatch(frames=batch["frames"], mean_origin=batch["origin"],
                        mask=batch["vmask"])
        t = TextBatch(bows=batch["bows"], tokens=batch["tokens"],
                      type_ids=batch["type_ids"], mask=batch["tmask"])
        _, post_embs = model.apply(variables, batch["brand_ids"], v, t,
                                   deterministic=True)
        return post_embs

    return encode


def encode_data(model, params, batch_stats, loader, common_dim: int,
                encode_fn=None, mesh=None, token_buckets=None,
                frame_buckets=None) -> Tuple[np.ndarray, np.ndarray]:
    """Encode every post in `loader` -> (brands, post_embs) scattered by
    dataset index (reference evaluator.py:38-81).

    With a mesh, each batch is device_put sharded over the 'data' axis so
    the encode forward runs data-parallel across the mesh (GSPMD inserts
    the collectives).

    token_buckets/frame_buckets: quantized dynamic padding (one jitted
    program per bucket shape; exact -- see data/loader.bucket_batch).
    Pair with a length-sorted loader (BatchLoader grouped='sort') so the
    buckets bite; the idxs scatter makes the reorder composition-free."""
    encode_fn = encode_fn or make_encode_fn(model)
    n = len(loader.dataset)
    post_embs = np.zeros((n, common_dim), np.float32)
    brands = np.zeros(n, np.int32)
    from fancyrec_tpu.utils.meters import Progress
    progress = Progress(n, label="encode")

    process_local = getattr(loader, "process_shard", None) is not None

    def stage(batch):
        """Host->device staging (runs on the prefetch thread so the mmap
        gather + transfer of batch i+1 overlap the device encode of i)."""
        dev = {k: batch[k] for k in _MODEL_KEYS if k in batch}
        if token_buckets or frame_buckets:
            from fancyrec_tpu.data.loader import bucket_batch
            # process-sharded loaders carry the GLOBAL length maxima so
            # every host slices identical bucket shapes
            maxima = ({k: batch[k] for k in ("tlen_max", "flen_max")}
                      if "tlen_max" in batch else None)
            dev = bucket_batch(dev, token_buckets, frame_buckets,
                               maxima=maxima)
        if mesh is not None:
            from fancyrec_tpu.parallel.mesh import shard_batch
            dev = shard_batch(mesh, dev, batch_axis=0,
                              process_local=process_local)
        else:
            dev = jax.device_put(dev)
        return batch, dev

    def fetch(out):
        """Device -> host. On a multi-host pod the jit output inherits the
        global 'data' sharding and spans non-addressable devices; every
        process needs the full batch to scatter into its local copy, so
        all-gather across processes first."""
        if mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                out, tiled=True))
        return np.asarray(out)

    from fancyrec_tpu.data.loader import prefetch_to_device
    # multi-process: stage on the consumer thread. Bisected deadlock (the
    # 2-process test, tests/test_multiprocess.py): device_put of global
    # arrays on the prefetch thread, concurrent with the main thread's
    # per-batch process_allgather collective, wedges the XLA:CPU gloo
    # backend after the first batch; the same staging on the main thread
    # runs clean. Host batch assembly still overlaps compute.
    stream = prefetch_to_device(iter(loader), size=2, device_put=stage,
                                stage_on_consumer=jax.process_count() > 1)
    for batch, dev in stream:
        embs = fetch(encode_fn(params, batch_stats, dev))
        k = batch["n_valid"]
        # batches are sorted by caption length; idxs carries the scatter map
        idxs = batch["idxs"]
        # padding rows (repeat of the last item) overwrite with identical
        # values, so scattering all rows is safe; n_valid kept for clarity
        post_embs[idxs] = embs
        # process-sharded loaders ship LOCAL model arrays but global
        # bookkeeping: scatter labels from the global copy then
        brands[idxs] = batch.get("brand_ids_global", batch["brand_ids"])
        progress.add(k)
    return brands, post_embs


def make_encode_vis_fn(model):
    """Jitted visual-only embedding (reference VisDataSet4DualEncoding path:
    model.embed_vis without fusion, data_provider.py:275-299)."""

    @jax.jit
    def encode(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        v = VisualBatch(frames=batch["frames"], mean_origin=batch["origin"],
                        mask=batch["vmask"])
        return model.apply(variables, v, deterministic=True,
                           method=model.embed_vis)

    return encode


def make_encode_txt_fn(model):
    """Jitted text-only embedding (reference TxtDataSet4DualEncoding path)."""

    @jax.jit
    def encode(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        t = TextBatch(bows=batch["bows"], tokens=batch["tokens"],
                      type_ids=batch["type_ids"], mask=batch["tmask"])
        return model.apply(variables, t, deterministic=True,
                           method=model.embed_txt)

    return encode


def random_sim(num_brands: int, num_test_posts: int,
               seed: int = None) -> np.ndarray:
    """Random-baseline similarity matrix (reference evaluator.py:31-35;
    its only call site is commented out at evaluator.py:102). Kept for the
    same ablation: swap it for the cosine scores to sanity-check that the
    metrics collapse to chance."""
    rng = np.random.RandomState(seed) if seed is not None else np.random
    return rng.rand(num_brands, num_test_posts)


def brand_embeddings(model, params, brand_num: int) -> jnp.ndarray:
    """All-brand embeddings: aspect mixtures meaned over the aspect axis
    (reference evaluator.py:89-94)."""
    variables = {"params": params}
    brand_ids = jnp.arange(brand_num, dtype=jnp.int32)
    return model.apply(variables, brand_ids, deterministic=True,
                       method=model.embed_brand)


def test_post_ranking(model, params, brand_num: int, post_embs, brands,
                      mesh=None) -> RankingMetrics:
    """Full brands x posts cosine similarity + ranking metrics, on device.

    With a mesh whose 'data' axis is >1, the post axis is padded to the
    shard count (pad posts carry brand label -1, which the metric kernel
    scores -inf and excludes from pos/neg counts) and sharded, so the
    similarity matmul and per-brand statistics run distributed."""
    aspects = brand_embeddings(model, params, brand_num)
    if mesh is not None and int(mesh.devices.shape[0]) > 1:
        # pad on HOST and place each shard directly (a jnp pad would first
        # materialize the full matrix on device 0, then reshard -- a wasted
        # full copy at the 1M-post scale)
        from jax.sharding import NamedSharding, PartitionSpec as P
        post_embs = np.asarray(post_embs)
        brands = np.asarray(brands, np.int32)
        shards = int(mesh.devices.shape[0])
        pad = (-post_embs.shape[0]) % shards
        if pad:
            post_embs = np.concatenate(
                [post_embs, np.ones((pad, post_embs.shape[1]),
                                    post_embs.dtype)])
            brands = np.concatenate([brands, np.full(pad, -1, np.int32)])
        post_embs = jax.device_put(
            post_embs, NamedSharding(mesh, P("data", None)))
        brands = jax.device_put(brands, NamedSharding(mesh, P("data")))
        scores = jax.jit(cosine_sim_matrix)(aspects, post_embs)
        # exact sharded order statistics: the (B, N) matrix stays
        # distributed through the metric kernel too
        m = ranking_metrics_sharded(scores, brands, brand_num, mesh)
    else:
        post_embs = jnp.asarray(post_embs)
        brands = jnp.asarray(brands, jnp.int32)
        scores = cosine_sim_matrix(aspects, post_embs)
        m = ranking_metrics_jax(scores, brands, brand_num)
    return RankingMetrics(*[float(x) for x in m])
