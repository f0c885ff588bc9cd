"""Serving: persistent post-embedding indexes + brand -> top-k post query.

The production shape of the reference's tester flow (tester.py:106-113
re-encodes the split and materializes the whole score matrix every run):
here encoding happens once into an on-disk index (a BigFile of post
embeddings + a brand-label sidecar, so the index interoperates with every
BigFile tool), and queries run the streaming top-k -- O(B*(block+k))
memory regardless of index size, shardable over a device mesh for
multi-chip serving.

CLI:
  fancyrec-index build --checkpoint ... --rootpath ... --collection ... out/
  fancyrec-index add out/ --rootpath ... --collection newposts
  fancyrec-index query out/ --brands 0,3,7 --k 10 [--mesh_shape auto]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.io.bigfile import BigFileReader, BigFileWriter
from fancyrec_tpu.ops.similarity import (
    distributed_retrieval_topk, retrieval_topk, retrieval_topk_fused_int8)

# Post-axis block of the fused int8 score+top-k kernel (ops/similarity.py):
# the staged index pads to this multiple so the padded copy happens ONCE at
# load, never inside the per-query jit (an in-trace pad would copy the
# whole index in HBM on every query).
_FUSED_BLOCK = 8192


def _encode_collection(ckpt, rootpath: str, collection: str,
                       batch_size: int, bert_vocab: str, mesh=None):
    """Encode one collection with a loaded checkpoint -> (cap_ids, brands,
    post_embs, cfg, model, params)."""
    from fancyrec_tpu.data.dataset import PostDataset, load_info
    from fancyrec_tpu.data.loader import BatchLoader
    from fancyrec_tpu.data.tokenizer import WordPieceTokenizer
    from fancyrec_tpu.eval.evaluator import encode_data
    from fancyrec_tpu.io.bigfile import ImageBigFile
    from fancyrec_tpu.io.dictfile import read_dict
    from fancyrec_tpu.io.vocab import Bow2Vec, load_vocab
    from fancyrec_tpu.models import FancyRec

    cfg = ckpt["config"]
    cfg.rootpath = rootpath

    video_feat = ImageBigFile(os.path.join(rootpath, collection, "FeatureData",
                                           cfg.video_feature))
    img_feat = ImageBigFile(os.path.join(rootpath, collection, "FeatureData",
                                         cfg.img_feature))
    video2frames = read_dict(os.path.join(
        rootpath, collection, "FeatureData", cfg.video_feature,
        "video2frames.txt"))
    bow_vocab = load_vocab(os.path.join(
        rootpath, cfg.trainCollection, "TextData", "vocabulary", "bow",
        cfg.vocab + ".pkl"))
    rnn_vocab = load_vocab(os.path.join(
        rootpath, cfg.trainCollection, "TextData", "vocabulary", "rnn",
        cfg.vocab + ".pkl"))
    cfg.bow_vocab_size = len(bow_vocab)
    cfg.vocab_size = len(rnn_vocab)
    cfg.finalize()
    tokenizer = None
    if cfg.text_net == "transformers":
        tokenizer = WordPieceTokenizer(
            bert_vocab or cfg.bert_vocab
            or os.path.join(rootpath, "bert_vocab.txt"))
    img_info, cls_info = load_info(rootpath)

    dataset = PostDataset(
        os.path.join(rootpath, collection, "TextData",
                     "%s.caption.txt" % collection),
        video_feat, img_feat, Bow2Vec(bow_vocab), text_net=cfg.text_net,
        rnn_vocab=rnn_vocab, tokenizer=tokenizer, video2frames=video2frames,
        img_info=img_info, cls_info=cls_info, max_frames=cfg.max_frames,
        max_tokens=cfg.max_tokens, max_words=cfg.max_words)
    # pod-scale builds: each host gathers only its 1/P slice of every
    # batch (same contract as the trainer/tester loaders; None on a
    # single process or a non-process-blocked mesh)
    pshard = None
    if mesh is not None:
        from fancyrec_tpu.parallel.mesh import process_batch_shard
        pshard = process_batch_shard(mesh, batch_size)
    # train-time bucket config rides the checkpoint (same wiring as the
    # tester): length-sort the encode order so bucketed dynamic padding
    # bites -- 6.9x measured on the recipe's image-heavy length mix, and
    # index builds are the bulk encode in production. Composition-free:
    # rows are written back through cap_ids in dataset order below.
    bucketing = bool(cfg.token_buckets_list or cfg.frame_buckets_list)
    loader = BatchLoader(dataset, batch_size, final_batch="pad",
                         grouped="sort" if bucketing else "off",
                         process_shard=pshard)

    model = FancyRec(cfg)
    params = ckpt["model"]["params"]
    batch_stats = ckpt["model"].get("batch_stats", {})
    brands, post_embs = encode_data(model, params, batch_stats, loader,
                                    cfg.common_embedding_size, mesh=mesh,
                                    token_buckets=cfg.token_buckets_list,
                                    frame_buckets=cfg.frame_buckets_list)
    return dataset.caps.cap_ids, brands, post_embs, cfg, model, params


def build_index(checkpoint_path: str, rootpath: str, collection: str,
                out_dir: str, batch_size: int = 128,
                bert_vocab: str = "", mesh=None) -> int:
    """Encode every post of a collection into an on-disk index."""
    from fancyrec_tpu.eval.evaluator import brand_embeddings
    from fancyrec_tpu.train import checkpoints

    ckpt = checkpoints.load_any(checkpoint_path)
    cap_ids, brands, post_embs, cfg, model, params = _encode_collection(
        ckpt, rootpath, collection, batch_size, bert_vocab, mesh)

    # multi-host: every process participates in the collective encode
    # above, but only the primary touches the (shared) filesystem --
    # concurrent identical writers would corrupt the store
    from fancyrec_tpu.parallel.distributed import is_primary
    if not is_primary():
        return len(cap_ids)

    # a rebuild over an existing index dir must invalidate any int8
    # sidecar cache: mtime ordering alone cannot tell a same-second
    # rebuild with an unchanged row count from a valid cache, and a stale
    # sidecar would silently serve scores quantized from old embeddings
    for stale in ("feature.int8.bin", "inv_norms.npy"):
        p = os.path.join(out_dir, stale)
        if os.path.exists(p):
            os.remove(p)
    # same for the IVF ANN sidecar: its packed row indices point into the
    # OLD store, so a rebuild would serve old-embedding rankings (or
    # IndexError through the new cap_ids list)
    ivf_dir = os.path.join(out_dir, "ivf")
    if os.path.isdir(ivf_dir):
        import shutil
        shutil.rmtree(ivf_dir)
    # cap_ids contain '#' (the caption-id grammar), so the index store uses
    # a tab-delimited id.txt -- same BigFile layout otherwise
    with BigFileWriter(out_dir, ndims=cfg.common_embedding_size,
                       delimiter="\t") as w:
        w.write_batch(cap_ids, post_embs)
    np.save(os.path.join(out_dir, "brands.npy"), brands)
    # precompute brand-tower embeddings so queries don't need the model
    b_embs = np.asarray(brand_embeddings(model, params, cfg.brand_num))
    np.save(os.path.join(out_dir, "brand_embeddings.npy"), b_embs)
    with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
        f.write(json.dumps({"collection": collection,
                            "checkpoint": os.path.abspath(checkpoint_path),
                            "brand_num": cfg.brand_num,
                            "dim": cfg.common_embedding_size,
                            "n_posts": len(cap_ids)}))
    return len(cap_ids)


def add_collection_to_index(index_dir: str, rootpath: str, collection: str,
                            batch_size: int = 128, bert_vocab: str = "",
                            mesh=None) -> int:
    """Encode a new collection with the index's own checkpoint and append
    its posts (incremental index update; no rebuild)."""
    from fancyrec_tpu.train import checkpoints

    with open(os.path.join(index_dir, "index_meta.json")) as f:
        meta = json.loads(f.read())
    ckpt = checkpoints.load_any(meta["checkpoint"])
    cap_ids, brands, post_embs, _, _, _ = _encode_collection(
        ckpt, rootpath, collection, batch_size, bert_vocab, mesh)
    return append_to_index(index_dir, cap_ids, post_embs, brands)


def append_to_index(index_dir: str, cap_ids, post_embs, brands) -> int:
    """Incrementally add posts to an existing index (no rebuild).

    feature.bin is row-major float32, so new rows append in place;
    id.txt / shape.txt / brands.npy / index_meta.json are rewritten.
    Duplicate cap_ids are rejected (BigFile names are unique). Returns
    the new total post count. Open PostIndex instances must refresh().
    """
    store = BigFileReader(index_dir, delimiter="\t")
    post_embs = np.asarray(post_embs, np.float32)
    brands = np.asarray(brands, np.int32)
    if post_embs.shape[1] != store.ndims:
        raise ValueError("dim mismatch: index %d, new rows %d"
                         % (store.ndims, post_embs.shape[1]))
    if len(cap_ids) != len(post_embs) or len(brands) != len(post_embs):
        raise ValueError("cap_ids/brands/post_embs length mismatch")
    dup = set(cap_ids) & set(store.names)
    if dup:
        raise ValueError("duplicate post ids: %s" % sorted(dup)[:5])
    if len(set(cap_ids)) != len(cap_ids):
        raise ValueError("duplicate ids within the appended batch")
    if np.isnan(post_embs).any():
        raise ValueError("NaN rows in appended embeddings")

    # multi-host: validations run everywhere (same inputs), writes only on
    # the primary -- a shared-FS append from every process would
    # duplicate rows
    from fancyrec_tpu.parallel.distributed import is_primary
    if not is_primary():
        return store.nr_of_rows + len(cap_ids)

    with open(os.path.join(index_dir, "feature.bin"), "ab") as f:
        f.write(np.ascontiguousarray(post_embs).tobytes())
    _maybe_append_quantized_sidecar(index_dir, post_embs,
                                    store.nr_of_rows, store.ndims)
    names = list(store.names) + list(cap_ids)
    with open(os.path.join(index_dir, "id.txt"), "w", encoding="utf-8") as f:
        f.write("\t".join(names))
    with open(os.path.join(index_dir, "shape.txt"), "w") as f:
        f.write("%d %d" % (len(names), store.ndims))
    old_brands = np.load(os.path.join(index_dir, "brands.npy"))
    np.save(os.path.join(index_dir, "brands.npy"),
            np.concatenate([old_brands.astype(np.int32), brands]))
    meta_path = os.path.join(index_dir, "index_meta.json")
    with open(meta_path) as f:
        meta = json.loads(f.read())
    meta["n_posts"] = len(names)
    with open(meta_path, "w") as f:
        f.write(json.dumps(meta))
    return len(names)


def _maybe_append_quantized_sidecar(index_dir: str, new_rows: np.ndarray,
                                    n_before: int, ndims: int) -> None:
    """Keep the int8 sidecar cache (see PostIndex._load_quantized) in sync
    across appends: rows quantize independently, so the existing prefix
    stays valid and only the new tail is quantized. A sidecar that does
    not exactly match the pre-append store is left for the next quantized
    load to rebuild."""
    from fancyrec_tpu.ops.similarity import quantize_rows_int8_np

    qpath = os.path.join(index_dir, "feature.int8.bin")
    ipath = os.path.join(index_dir, "inv_norms.npy")
    if not (os.path.exists(qpath) and os.path.exists(ipath)):
        return
    if os.path.getsize(qpath) != n_before * ndims:
        return
    inv = np.load(ipath).astype(np.float32)
    if inv.size != n_before:
        return
    tail, tinv = quantize_rows_int8_np(new_rows)
    with open(qpath, "ab") as f:
        f.write(np.ascontiguousarray(tail).tobytes())
    np.save(ipath, np.concatenate([inv, tinv]))


class PostIndex:
    """Query interface over a built index directory.

    The top-k program is jitted once per (n_posts, n_brands, k, block,
    dtype) and cached -- retrieval_topk is a lax.scan builder, and eager
    per-query dispatch would dwarf the ~59 ms kernel time at 1M posts.
    With a mesh whose `axis` dimension is >1, the posts live sharded
    across devices (padded to the shard multiple; pad rows masked inside
    the scan) and queries run the distributed cross-shard merge.

    quantize="int8" stores the index int8 on device (per-row max-abs
    quantization on the host, so loads ship 1 byte/elem) and scores with
    the exact-int32 MXU path: 4x less HBM per query, ~1e-3 score error
    from rounding -- rankings can differ from f32 on near-ties.
    """

    def __init__(self, index_dir: str, device_resident: bool = True,
                 mesh=None, mesh_axis: str = "data", quantize: str = "",
                 fused: "bool | None" = None):
        if quantize not in ("", "int8"):
            raise ValueError("quantize must be '' or 'int8'")
        self.quantize = quantize
        self._fused_opt = fused
        self._index_dir = index_dir
        self.store = BigFileReader(index_dir, delimiter="\t")
        self.cap_ids = self.store.names
        self.brands = np.load(os.path.join(index_dir, "brands.npy"))
        self.brand_embs = np.load(
            os.path.join(index_dir, "brand_embeddings.npy"))
        with open(os.path.join(index_dir, "index_meta.json")) as f:
            self.meta = json.loads(f.read())
        self.n_posts = self.store.nr_of_rows
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._shards = 1
        if mesh is not None:
            self._shards = int(
                mesh.devices.shape[list(mesh.axis_names).index(mesh_axis)])
        self._posts = None
        self._posts_inv = None
        self._query_cache = {}
        self._ivf = None
        self._ivf_stale = ""
        if device_resident:
            self.posts()

    def refresh(self) -> None:
        """Reload after append_to_index: new store view, dropped device
        cache and jit cache (the program is shape-specialized)."""
        self.store = BigFileReader(self._index_dir, delimiter="\t")
        self.cap_ids = self.store.names
        self.brands = np.load(os.path.join(self._index_dir, "brands.npy"))
        with open(os.path.join(self._index_dir, "index_meta.json")) as f:
            self.meta = json.loads(f.read())
        self.n_posts = self.store.nr_of_rows
        self._posts = None
        self._posts_inv = None
        self._query_cache = {}
        # appends invalidate the ANN sidecar layout; the next ivf() call
        # re-reads ivf_meta.json and flags the row-count mismatch stale
        self._ivf = None
        self._ivf_stale = ""

    def ivf(self):
        """Lazy-loaded IVF sidecar (build_ivf_sidecar), or None.

        The sidecar's packed row indices point into the store it was
        built from; serving it against a store with a different row
        count (append_to_index, or an out-of-band rebuild) would return
        wrong cap_ids or IndexError. ivf_meta.json records source_posts
        at build time -- a mismatch marks the sidecar stale and the ANN
        path refuses until `fancyrec-index ivf-build` reruns."""
        if self._ivf is None:
            self._ivf_stale = ""
            ivf_dir = os.path.join(self._index_dir, "ivf")
            meta_path = os.path.join(ivf_dir, "ivf_meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    src = json.loads(f.read()).get("source_posts", -1)
                if src != self.n_posts:
                    self._ivf_stale = (
                        "IVF sidecar is stale: built over %s posts, store "
                        "now has %d -- rerun `fancyrec-index ivf-build %s`"
                        % (src if src >= 0 else "unknown", self.n_posts,
                           self._index_dir))
                    return None
                from fancyrec_tpu.serving.ivf import IVFIndex
                self._ivf = IVFIndex.load(ivf_dir)
                if self.mesh is not None and self._shards > 1:
                    # capacity mode: packed lists sharded over the mesh,
                    # query results identical to single-device (the
                    # probe set is replicated; see IVFIndex.shard_to_mesh)
                    self._ivf.shard_to_mesh(self.mesh, self.mesh_axis)
        return self._ivf

    def _load_quantized(self):
        """int8 rows + inv-norm sidecar, cached on disk next to the store
        (feature.int8.bin / inv_norms.npy): reloads read 1 byte/elem from
        disk and skip host requantization. Valid only if at least as new
        as feature.bin with exactly matching row counts (append_to_index
        maintains it across appends); anything else requantizes in full.
        Read-only index dirs fall back to in-memory quantization."""
        from fancyrec_tpu.ops.similarity import quantize_rows_int8_np

        n, d = self.n_posts, self.store.ndims
        qpath = os.path.join(self._index_dir, "feature.int8.bin")
        ipath = os.path.join(self._index_dir, "inv_norms.npy")
        fpath = os.path.join(self._index_dir, "feature.bin")
        if os.path.exists(qpath) and os.path.exists(ipath) \
                and os.path.getmtime(qpath) >= os.path.getmtime(fpath):
            q = np.fromfile(qpath, np.int8)
            try:
                inv = np.load(ipath).astype(np.float32)
            except (ValueError, OSError):
                inv = np.zeros(0, np.float32)   # corrupt sidecar: rebuild
            if q.size == n * d and inv.size == n:
                return q.reshape(n, d), inv
        q, inv = quantize_rows_int8_np(
            self.store.read_rows(np.arange(n)))
        try:
            # both sidecars written atomically (tmp + rename): a crash
            # mid-save must leave either a complete file or none, never a
            # truncated one that poisons every later load
            with open(qpath + ".tmp", "wb") as f:
                f.write(np.ascontiguousarray(q).tobytes())
            os.replace(qpath + ".tmp", qpath)
            np.save(ipath + ".tmp.npy", inv)
            os.replace(ipath + ".tmp.npy", ipath)
        except OSError:
            pass
        return q, inv

    def _fused_eligible(self) -> bool:
        """The fused Pallas score+top-k path (ops/similarity.py): int8 on
        TPU (or forced for tests -- interpret mode runs it anywhere),
        never under portable export lowering. Engages both single-device
        and mesh capacity mode (per-shard kernel under shard_map, shard
        valid counts in SMEM)."""
        if self.quantize != "int8":
            return False
        if self._fused_opt is not None:
            return bool(self._fused_opt)
        from fancyrec_tpu.ops.dispatch import portable_mode
        if portable_mode() or jax.default_backend() != "tpu":
            return False
        # MXU-lane-friendly embedding dim only (production is 1024);
        # tiny test configs stay on the XLA matrix path
        if self.store.ndims % 128:
            return False
        return self._shards > 1 or jax.device_count() == 1

    def posts(self) -> jnp.ndarray:
        if self._posts is None:
            inv = None
            if self.quantize == "int8":
                rows, inv = self._load_quantized()
            else:
                rows = self.store.read_rows(np.arange(self.n_posts))
            pad = (-self.n_posts) % self._shards
            if self._fused_eligible():
                # each of the _shards equal slices must itself be a
                # multiple of the kernel block
                pad = (-self.n_posts) % (_FUSED_BLOCK * self._shards)
            if pad:
                rows = np.concatenate(
                    [rows, np.zeros((pad, rows.shape[1]), rows.dtype)])
                if inv is not None:
                    inv = np.concatenate([inv, np.zeros(pad, np.float32)])
            if self.mesh is not None and self._shards > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._posts = jax.device_put(
                    rows, NamedSharding(self.mesh, P(self.mesh_axis, None)))
                if inv is not None:
                    self._posts_inv = jax.device_put(
                        inv, NamedSharding(self.mesh, P(self.mesh_axis)))
            else:
                self._posts = jnp.asarray(rows)
                if inv is not None:
                    self._posts_inv = jnp.asarray(inv)
        return self._posts

    def _jitted_topk(self, n_brands: int, k: int, block: int, score_dtype):
        key = (self.n_posts, n_brands, k, block, jnp.dtype(score_dtype).name)
        fn = self._query_cache.get(key)
        if fn is None:
            if self.mesh is not None and self._shards > 1:
                mesh, axis, n_valid = self.mesh, self.mesh_axis, self.n_posts
                use_fused = (
                    self._fused_eligible() and k <= 128
                    and self.posts().shape[0]
                    % (_FUSED_BLOCK * self._shards) == 0)
                dblock = _FUSED_BLOCK if use_fused else block

                def run(q, posts, inv):
                    return distributed_retrieval_topk(
                        q, posts, k, mesh, axis=axis, block=dblock,
                        n_valid=n_valid, score_dtype=score_dtype,
                        posts_inv=inv, fused=use_fused)
            elif (self._fused_eligible() and k <= 128
                  and self.posts().shape[0] % _FUSED_BLOCK == 0):
                nv = self.n_posts

                def run(q, posts, inv):
                    return retrieval_topk_fused_int8(
                        q, posts, inv, k, block=_FUSED_BLOCK, n_valid=nv)
            else:
                def run(q, posts, inv):
                    return retrieval_topk(q, posts, k, block=block,
                                          score_dtype=score_dtype,
                                          n_valid=self.n_posts,
                                          posts_inv=inv)
            fn = jax.jit(run)
            self._query_cache[key] = fn
        return fn

    def query(self, brand_ids: Sequence[int], k: int = 10,
              block: int = 4096, score_dtype=jnp.float32,
              nprobe: int = 0) -> Tuple[np.ndarray, list]:
        """-> (scores (B, k), [[cap_id, ...] per brand]) best-first.

        When k exceeds the number of posts, the trailing slots carry
        score -inf and name None (the top-k kernels pad with index-0
        filler that must not surface as a real cap_id).

        nprobe > 0 routes through the IVF-Flat ANN sidecar
        (build_ivf_sidecar): approximate, reads ~nprobe/nlist of the
        index -- for SINGLE-brand queries at 10M+ posts. Batched
        all-brand queries should keep the exact path (one full index
        read amortizes across the whole batch)."""
        q_np = self.brand_embs[np.asarray(brand_ids)]
        if nprobe > 0:
            ivf = self.ivf()
            if ivf is None:
                raise ValueError(
                    self._ivf_stale
                    or "nprobe given but no IVF sidecar: run "
                       "`fancyrec-index ivf-build %s` first"
                       % self._index_dir)
            vals, idxs = ivf.query(q_np, k=k, nprobe=nprobe)
            names = [[self.cap_ids[i] if i >= 0 else None for i in row]
                     for row in idxs]
            return vals, names
        q = jnp.asarray(q_np)
        fn = self._jitted_topk(q.shape[0], k, block, score_dtype)
        vals, idxs = fn(q, self.posts(), self._posts_inv)
        idxs = np.asarray(idxs)
        vals = np.asarray(vals)
        names = [[self.cap_ids[i] if np.isfinite(v) else None
                  for i, v in zip(row, vrow)]
                 for row, vrow in zip(idxs, vals)]
        return vals, names


def build_ivf_sidecar(index_dir: str, nlist: int = None, iters: int = 10,
                      quantize: str = "", seed: int = 0,
                      train_rows: int = 524288) -> dict:
    """Build the IVF-Flat ANN sidecar for an existing index directory
    (single-query serving at 10M+ posts; see serving/ivf.py). The sidecar
    lives under <index_dir>/ivf and is picked up by
    PostIndex.query(..., nprobe=N)."""
    from fancyrec_tpu.serving.ivf import IVFIndex

    store = BigFileReader(index_dir, delimiter="\t")
    # streamed build: neither host nor device ever holds the full f32
    # corpus (40 GB at the 10M x 1024 design scale) -- rows arrive in
    # chunks straight from the BigFile mmap. Bit-identical to the
    # monolithic IVFIndex.build when k-means sees the full corpus, i.e.
    # stores up to `train_rows` rows (pinned in tests); beyond that
    # k-means trains on an evenly-strided train_rows-row sample -- raise
    # --kmeans_train_rows to the store size to opt back into full-sample
    # centroids when memory allows (~4 GB f32 per 1M x 1024 rows).
    ivf = IVFIndex.build_chunked(
        lambda lo, hi: store.read_rows(np.arange(lo, hi)),
        store.nr_of_rows, store.ndims, nlist=nlist, iters=iters, seed=seed,
        quantize=quantize, train_rows=train_rows)
    out = os.path.join(index_dir, "ivf")
    # stamp the store size the sidecar was built from BEFORE save (it is
    # part of IVFIndex.save()'s own meta): PostIndex.ivf() refuses a
    # sidecar whose row-index space no longer matches the store, and any
    # save path -- including a user re-save through the public API --
    # must carry the stamp rather than be permanently flagged stale
    ivf.source_posts = store.nr_of_rows
    ivf.save(out)
    return {"nlist": int(ivf.nlist), "cap": int(ivf.cap),
            "posts": store.nr_of_rows, "spill_frac": ivf.spill_frac,
            "overflow_lists": int(ivf.overflow_lists), "out": out}


def main(argv=None):
    p = argparse.ArgumentParser(description="post-embedding index tool")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("out_dir")
    b.add_argument("--checkpoint", required=True)
    b.add_argument("--rootpath", required=True)
    b.add_argument("--collection", required=True)
    b.add_argument("--batch_size", type=int, default=128)
    b.add_argument("--bert_vocab", default="")
    b.add_argument("--mesh_shape", default="",
                   help="'auto' = encode data-parallel over all local "
                        "devices; 'N,1' explicit; '' = single device")
    ad = sub.add_parser("add")
    ad.add_argument("index_dir")
    ad.add_argument("--rootpath", required=True)
    ad.add_argument("--collection", required=True,
                    help="new collection to encode (with the index's own "
                         "checkpoint) and append")
    ad.add_argument("--batch_size", type=int, default=128)
    ad.add_argument("--bert_vocab", default="")
    ad.add_argument("--mesh_shape", default="")
    iv = sub.add_parser("ivf-build")
    iv.add_argument("index_dir")
    iv.add_argument("--nlist", type=int, default=0,
                    help="coarse clusters (default ~2*sqrt(N))")
    iv.add_argument("--iters", type=int, default=10)
    iv.add_argument("--quantize", default="", choices=["", "int8"])
    iv.add_argument("--seed", type=int, default=0)
    iv.add_argument("--kmeans_train_rows", type=int, default=524288,
                    help="k-means training sample size (strided); set to "
                         ">= the store's row count for full-sample "
                         "centroids when ~4 GB f32 per 1M rows fits")
    q = sub.add_parser("query")
    q.add_argument("index_dir")
    q.add_argument("--brands", required=True,
                   help="comma-separated brand ids")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=0,
                   help=">0: approximate single-query path over the IVF "
                        "sidecar, probing nprobe coarse clusters")
    q.add_argument("--mesh_shape", default="",
                   help="'auto' = shard posts over all local devices; "
                        "'N' or 'N,1' = over N; '' = single device")
    q.add_argument("--quantize", default="", choices=["", "int8"],
                   help="int8: 4x smaller device-resident index, "
                        "exact-int32 MXU scoring (~1e-3 score rounding)")
    a = p.parse_args(argv)
    mesh = None
    if getattr(a, "mesh_shape", ""):
        # join the jax.distributed job first on a pod (no-op single host)
        # so the mesh sees all global devices
        from fancyrec_tpu.parallel.distributed import initialize_multihost
        initialize_multihost()
        from fancyrec_tpu.parallel.mesh import build_mesh
        mesh = build_mesh("" if a.mesh_shape == "auto" else a.mesh_shape)
    if a.cmd == "build":
        n = build_index(a.checkpoint, a.rootpath, a.collection, a.out_dir,
                        a.batch_size, a.bert_vocab, mesh=mesh)
        print(json.dumps({"indexed_posts": n, "out": a.out_dir}))
    elif a.cmd == "add":
        n = add_collection_to_index(a.index_dir, a.rootpath, a.collection,
                                    a.batch_size, a.bert_vocab, mesh=mesh)
        print(json.dumps({"total_posts": n, "index": a.index_dir}))
    elif a.cmd == "ivf-build":
        info = build_ivf_sidecar(a.index_dir, nlist=a.nlist or None,
                                 iters=a.iters, quantize=a.quantize,
                                 seed=a.seed,
                                 train_rows=a.kmeans_train_rows)
        print(json.dumps(info))
    else:
        index = PostIndex(a.index_dir, mesh=mesh, quantize=a.quantize,
                          device_resident=a.nprobe == 0)
        ids = [int(x) for x in a.brands.split(",")]
        vals, names = index.query(ids, k=a.k, nprobe=a.nprobe)
        for b_id, v, n in zip(ids, vals, names):
            print(json.dumps({"brand": b_id,
                              "results": [{"post": pid, "score": round(float(s), 5)}
                                          for pid, s in zip(n, v)]}))


if __name__ == "__main__":
    main()
