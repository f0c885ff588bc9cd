"""HTTP serving layer: PostIndex + ExportedModel behind JSON endpoints.

Starts the real ThreadingHTTPServer on an ephemeral port and talks to it
over actual sockets (http.client) -- the wire format is the contract.
"""

import http.client
import json
import threading

import numpy as np
import pytest

from fancyrec_tpu.serving.export import export_model
from fancyrec_tpu.serving.server import FancyRecService, make_server
from tests.test_export import _batch, _make_ckpt, _tiny_cfg
from tests.test_serving import _toy_index


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("server")
    idx_dir = str(tmp / "index")
    embs = _toy_index(idx_dir, n_posts=40, dim=16, brand_num=4, seed=0)

    cfg = _tiny_cfg()
    assert cfg.common_embedding_size == 16   # must match the index dim
    model, state, ckpt = _make_ckpt(tmp, cfg)
    art_dir = str(tmp / "artifacts")
    export_model(ckpt, art_dir, platforms=("cpu",), batch=0)

    service = FancyRecService(idx_dir, artifact_dir=art_dir)
    server = make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield {"port": server.server_port, "service": service, "embs": embs,
           "cfg": cfg, "idx_dir": idx_dir}
    server.shutdown()
    thread.join(timeout=10)


def _req(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    payload = json.dumps(body) if body is not None else None
    conn.request(method, path, body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def test_healthz(served):
    status, data = _req(served["port"], "GET", "/healthz")
    assert status == 200
    assert data["ok"] and data["n_posts"] == 40 and data["brand_num"] == 4
    assert "encode_post" in data["artifact_entries"]


def test_topk_matches_direct_query(served):
    status, data = _req(served["port"], "POST", "/v1/topk",
                        {"brand_ids": [0, 2], "k": 5})
    assert status == 200
    vals, names = served["service"].index.query([0, 2], k=5)
    for row, want_v, want_n in zip(data["results"], vals, names):
        assert [p["cap_id"] for p in row["posts"]] == want_n
        got_v = [p["score"] for p in row["posts"]]
        np.testing.assert_allclose(got_v, want_v, atol=1e-6)


def test_encode_and_recommend(served):
    cfg = served["cfg"]
    batch = _batch(cfg, 3, seed=7)
    body = {k: v.tolist() for k, v in batch.items()}
    status, data = _req(served["port"], "POST", "/v1/encode", body)
    assert status == 200
    embs = np.asarray(data["embeddings"], np.float32)
    assert embs.shape == (3, cfg.common_embedding_size)
    assert np.isfinite(embs).all()

    body["k"] = 3
    status, rec = _req(served["port"], "POST", "/v1/recommend", body)
    assert status == 200
    assert len(rec["results"]) == 3
    # recommendation = cosine vs the index's brand embeddings, best-first
    brands = served["service"].index.brand_embs.astype(np.float32)
    bn = brands / np.linalg.norm(brands, axis=1, keepdims=True)
    en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    want_order = np.argsort(-(en @ bn.T), axis=1)[:, :3]
    for row, want in zip(rec["results"], want_order):
        assert [r["brand"] for r in row] == list(want)
        assert all(row[i]["score"] >= row[i + 1]["score"]
                   for i in range(len(row) - 1))


def test_add_then_query_sees_new_post(served):
    port = served["port"]
    dim = 16
    rng = np.random.RandomState(3)
    # a post engineered to be brand 1's nearest neighbor
    new = served["service"].index.brand_embs[1] * 10.0
    status, data = _req(port, "POST", "/v1/add", {
        "cap_ids": ["fresh#enc#0", "fresh2#enc#0"],
        "embeddings": [new.tolist(), rng.randn(dim).tolist()],
        "brands": [1, 2]})
    assert status == 200 and data["n_posts"] == 42

    status, data = _req(port, "GET", "/healthz")
    assert data["n_posts"] == 42
    status, data = _req(port, "POST", "/v1/topk",
                        {"brand_ids": [1], "k": 3})
    assert status == 200
    assert data["results"][0]["posts"][0]["cap_id"] == "fresh#enc#0"


def test_error_paths(served):
    port = served["port"]
    status, data = _req(port, "POST", "/v1/topk", {"brand_ids": []})
    assert status == 400 and "brand_ids" in data["error"]
    status, data = _req(port, "POST", "/v1/topk", {"brand_ids": [99]})
    assert status == 400 and "out of range" in data["error"]
    # JSON booleans must not pass as brand ids (bool is an int subtype)
    status, data = _req(port, "POST", "/v1/topk", {"brand_ids": [True]})
    assert status == 400 and "out of range" in data["error"]
    # k < 1 would slice from the wrong end (negative indexing) or crash
    # lax.top_k -- both /v1/topk and /v1/recommend reject it up front
    status, data = _req(port, "POST", "/v1/topk",
                        {"brand_ids": [0], "k": -1})
    assert status == 400 and "positive integer" in data["error"]
    status, data = _req(port, "POST", "/v1/topk",
                        {"brand_ids": [0], "k": 0})
    assert status == 400 and "positive integer" in data["error"]
    status, data = _req(port, "POST", "/v1/recommend", {"k": -1})
    assert status == 400 and "positive integer" in data["error"]
    # nprobe shares the bug class: null must 400 (not 500), and a JSON
    # boolean must not silently route to the ANN path (true == 1)
    status, data = _req(port, "POST", "/v1/topk",
                        {"brand_ids": [0], "nprobe": None})
    assert status == 400 and "nprobe" in data["error"]
    status, data = _req(port, "POST", "/v1/topk",
                        {"brand_ids": [0], "nprobe": True})
    assert status == 400 and "nprobe" in data["error"]
    status, data = _req(port, "POST", "/v1/add", {"cap_ids": ["a"],
                        "embeddings": [[0.0] * 3], "brands": [0]})
    assert status == 400
    status, _ = _req(port, "GET", "/nope")
    assert status == 404
    status, data = _req(port, "POST", "/v1/encode", {"frames": []})
    assert status == 400 and "missing encode inputs" in data["error"]


def test_metrics_endpoint(served):
    """GET /metrics: per-route counts, error counts, and latency
    percentiles over a sliding window -- after known-good and known-bad
    requests the numbers must line up."""
    port = served["port"]
    before = _req(port, "GET", "/metrics")[1]["routes"].get(
        "/v1/topk", {"count": 0, "errors": 0})
    _req(port, "POST", "/v1/topk", {"brand_ids": [0], "k": 2})
    _req(port, "POST", "/v1/topk", {"brand_ids": [0], "k": 2})
    _req(port, "POST", "/v1/topk", {"brand_ids": [], "k": 2})   # 400
    status, data = _req(port, "GET", "/metrics")
    assert status == 200 and data["uptime_s"] >= 0
    topk = data["routes"]["/v1/topk"]
    assert topk["count"] == before["count"] + 3
    assert topk["errors"] == before["errors"] + 1
    # percentiles exist and come from successful requests only
    assert topk["window"] >= 2
    assert 0 <= topk["p50_ms"] <= topk["p99_ms"]


def test_topk_coalescing_under_concurrency(tmp_path):
    """8 threads hammering /v1/topk while the device is deliberately slow:
    results must be identical to serial requests, and /metrics must show
    fewer device calls than requests (the coalescer actually batched).
    Mixed (k, nprobe) keys must never merge."""
    import time

    idx_dir = str(tmp_path / "index")
    _toy_index(idx_dir, n_posts=40, dim=16, brand_num=4, seed=0)
    service = FancyRecService(idx_dir)
    server = make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_port
        # serial ground truth, recorded before the slowdown
        bodies = [{"brand_ids": [i % 4, (i + 1) % 4], "k": 5}
                  for i in range(8)]
        want = [_req(port, "POST", "/v1/topk", b)[1] for b in bodies]

        orig = service.index.query

        def slow_query(ids, k=10, nprobe=0):
            time.sleep(0.05)           # hold the device: forces pending
            return orig(ids, k=k, nprobe=nprobe)

        service.index.query = slow_query
        calls_before = service._coalescer.snapshot()

        got = [None] * 8
        def hammer(i):
            got[i] = _req(port, "POST", "/v1/topk", bodies[i])[1]
        threads = [threading.Thread(target=hammer, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)

        assert got == want              # byte-identical JSON payloads
        snap = service._coalescer.snapshot()
        new_req = snap["requests"] - calls_before["requests"]
        new_calls = snap["device_calls"] - calls_before["device_calls"]
        assert new_req == 8
        assert new_calls < new_req, (new_calls, new_req)   # batched!

        # a different k must not ride in the same batch: fire k=5 and k=3
        # concurrently and verify both come back right
        res = {}
        def mixed(k):
            res[k] = _req(port, "POST", "/v1/topk",
                          {"brand_ids": [0], "k": k})[1]
        ts = [threading.Thread(target=mixed, args=(k,)) for k in (5, 3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert len(res[5]["results"][0]["posts"]) == 5
        assert len(res[3]["results"][0]["posts"]) == 3

        # /metrics surfaces the coalescing counters
        m = _req(port, "GET", "/metrics")[1]
        assert m["topk_coalescing"]["requests"] >= 10
        service.index.query = orig
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_coalesced_batches_pad_to_power_of_two():
    """Multi-request coalesced batches must pad the concatenated query
    rows to a power of two (PostIndex.query compiles one program per row
    count; unpadded coalescing would compile a fresh TPU program for
    every distinct concatenation), while single-request batches keep
    their exact shape. Pad rows repeat a real brand id and are sliced
    off before results return."""
    import time

    from fancyrec_tpu.serving.server import _TopkCoalescer

    sizes = []
    lock = threading.Lock()

    def run(ids, k, nprobe):
        sizes.append(len(ids))
        time.sleep(0.05)          # hold the device so followers pend
        return ([[float(i)] * k for i in ids],
                [["p%d" % i] * k for i in ids])

    co = _TopkCoalescer(run, lock)
    results = [None] * 6
    def call(i):
        # 3 brand ids per request; coalesced totals are not powers of two
        results[i] = co.query([i % 4, (i + 1) % 4, (i + 2) % 4], 2, 0)
    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    snap = co.snapshot()
    assert snap["requests"] == 6
    assert snap["device_calls"] == len(sizes) < 6    # coalescing fired
    for n, r in zip(range(6), results):              # sliced per request
        assert len(r[0]) == 3 and len(r[1]) == 3
        assert r[0][0] == [float(n % 4)] * 2
    # first call is a lone leader (exact size 3); every multi-request
    # batch after it is a power of two
    multi = [s for s in sizes if s > 3]
    assert multi, sizes
    assert all(s & (s - 1) == 0 for s in multi), sizes


def test_leader_request_survives_full_batch():
    """The max_batch cap must never exclude the leader's OWN request:
    collecting in plain arrival order could fill the cap with earlier
    pending arrivals and leave the leader returning its own unserved
    None result. The batch is seeded with the leader, so the leader is
    served and the overflow requests stay pending for the next leader."""
    from fancyrec_tpu.serving.server import _Request, _TopkCoalescer

    def run(ids, k, nprobe):
        return ([[float(i)] * k for i in ids],
                [["p%d" % i] * k for i in ids])

    co = _TopkCoalescer(run, threading.Lock(), max_batch=2)
    # two single-brand requests already pending when the leader arrives
    stale = [_Request([9], 2, 0), _Request([8], 2, 0)]
    co._pending.extend(stale)
    vals, names = co.query([5, 6], 2, 0)   # leader alone fills max_batch
    assert [v[0] for v in vals] == [5.0, 6.0]
    assert [n[0] for n in names] == ["p5", "p6"]
    # the overflow requests were not silently dropped or falsely served
    assert co._pending == stale
    assert not stale[0].done and not stale[1].done


def test_oversized_pending_request_skipped_not_blocking():
    """One pending request too big for the remaining max_batch budget must
    be skipped (left for the next leader), NOT stop collection: smaller
    later arrivals that fit still ride the current batch."""
    from fancyrec_tpu.serving.server import _Request, _TopkCoalescer

    calls = []

    def run(ids, k, nprobe):
        calls.append(list(ids))
        return ([[float(i)] * k for i in ids],
                [["p%d" % i] * k for i in ids])

    co = _TopkCoalescer(run, threading.Lock(), max_batch=8)
    big = _Request(list(range(10, 17)), 2, 0)      # 7 ids: 2+7 > 8
    small = [_Request([7], 2, 0), _Request([8], 2, 0)]
    co._pending.extend([big] + small)
    vals, names = co.query([5, 6], 2, 0)           # leader: 2 ids
    assert [v[0] for v in vals] == [5.0, 6.0]
    # the small requests rode the leader's batch despite the big one
    assert small[0].done and small[1].done
    assert small[0].result[1][0][0] == "p7"
    assert small[1].result[1][0][0] == "p8"
    # the big request is untouched, pending for the next leader
    assert not big.done and co._pending == [big]
    assert len(calls) == 1 and len(calls[0]) == 4  # 2+1+1 padded to 4


def test_coalesced_error_propagates_to_every_waiter(tmp_path):
    """A failing batched device call must 500 every member of the batch,
    not hang followers."""
    import time

    idx_dir = str(tmp_path / "index")
    _toy_index(idx_dir, n_posts=10, dim=8, brand_num=2, seed=1)
    service = FancyRecService(idx_dir)

    def boom(ids, k=10, nprobe=0):
        time.sleep(0.02)
        raise RuntimeError("chip fell over")

    service.index.query = boom
    errs = []
    def call():
        try:
            service.topk({"brand_ids": [0], "k": 2})
        except RuntimeError as e:
            errs.append(str(e))
    threads = [threading.Thread(target=call) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert errs == ["chip fell over"] * 4


def test_service_on_device_mesh(tmp_path):
    """--mesh_shape serving: a FancyRecService whose index shards the
    resident posts over the local device mesh must answer /v1/topk
    identically to the single-device service (pad rows masked)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh

    idx_dir = str(tmp_path / "index")
    _toy_index(idx_dir, n_posts=37, dim=16, brand_num=3, seed=4)  # pads
    plain = FancyRecService(idx_dir)
    meshed = FancyRecService(idx_dir, mesh=build_mesh("8,1"))
    body = {"brand_ids": [0, 1, 2], "k": 5}
    a, b = plain.topk(body), meshed.topk(body)
    for ra, rb in zip(a["results"], b["results"]):
        assert [p["cap_id"] for p in ra["posts"]] == \
               [p["cap_id"] for p in rb["posts"]]
        for pa, pb in zip(ra["posts"], rb["posts"]):
            assert abs(pa["score"] - pb["score"]) < 1e-5


def test_service_without_artifact(tmp_path):
    idx_dir = str(tmp_path / "index")
    _toy_index(idx_dir, n_posts=10, dim=8, brand_num=2, seed=1)
    service = FancyRecService(idx_dir)
    assert service.healthz()["artifact_entries"] == []
    with pytest.raises(ValueError, match="no --artifact"):
        service.encode({})


# -- overload shedding (VERDICT r4 #7) ----------------------------------

def test_admission_gate_unit():
    from fancyrec_tpu.serving.server import Overloaded, _AdmissionGate

    gate = _AdmissionGate(max_pending=2, retry_after_s=3)
    gate.enter()
    gate.enter()
    with pytest.raises(Overloaded) as ei:
        gate.enter()
    assert ei.value.retry_after_s == 3 and ei.value.depth == 2
    snap = gate.snapshot()
    assert snap == {"pending_depth": 2, "max_pending": 2,
                    "peak_depth": 2, "shed_total": 1}
    gate.exit()
    gate.enter()                       # freed slot admits again
    gate.exit()
    gate.exit()
    assert gate.snapshot()["pending_depth"] == 0
    assert gate.snapshot()["peak_depth"] == 2


def _req_full(port, method, path, body=None, timeout=60):
    """Like _req but also returns the response headers."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    payload = json.dumps(body) if body is not None else None
    conn.request(method, path, body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    headers = dict(resp.getheaders())
    conn.close()
    return resp.status, data, headers


def test_overload_sheds_429_keeps_admitted_bounded(tmp_path):
    """A burst far past max_pending: admitted requests all succeed, the
    rest shed FAST with 429 + Retry-After (never parking a server thread
    behind the device lock), /healthz and /metrics stay responsive, and
    the pending-depth gauge tracks the gate."""
    import time as _time

    idx_dir = str(tmp_path / "index")
    _toy_index(idx_dir, n_posts=20, dim=8, brand_num=3, seed=2)
    service = FancyRecService(idx_dir, max_pending=4)

    real_query = service.index.query
    started, release = threading.Event(), threading.Event()

    def blocked_query(ids, k=10, nprobe=0):
        started.set()
        assert release.wait(timeout=30), "test never released the device"
        return real_query(ids, k=k, nprobe=nprobe)

    service.index.query = blocked_query
    server = make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_port
    body = {"brand_ids": [0, 1], "k": 3}

    results, lock = [], threading.Lock()

    def admitted_client():
        out = _req_full(port, "POST", "/v1/topk", body)
        with lock:
            results.append(out)

    try:
        # 1 leader occupies the device; 3 more fill the gate to max_pending
        clients = [threading.Thread(target=admitted_client)
                   for _ in range(4)]
        clients[0].start()
        assert started.wait(timeout=30)
        for c in clients[1:]:
            c.start()
        deadline = _time.monotonic() + 10
        while service.gate.depth < 4:
            assert _time.monotonic() < deadline, service.gate.snapshot()
            _time.sleep(0.005)

        # the flood: 20 more requests while the device is wedged -- every
        # one must shed immediately (the whole flood completes in well
        # under the blocked query's duration)
        t0 = _time.monotonic()
        sheds = [_req_full(port, "POST", "/v1/topk", body)
                 for _ in range(20)]
        flood_wall = _time.monotonic() - t0
        assert all(s == 429 for s, _, _ in sheds)
        assert flood_wall < 5.0, flood_wall
        for _, data, headers in sheds:
            assert int(headers["Retry-After"]) >= 1
            assert "overloaded" in data["error"]

        # un-gated routes stay responsive while the device is wedged
        status, health, _ = _req_full(port, "GET", "/healthz")
        assert status == 200 and health["ok"]
        status, metrics, _ = _req_full(port, "GET", "/metrics")
        assert status == 200
        assert metrics["overload"]["pending_depth"] == 4
        assert metrics["overload"]["shed_total"] == 20
        assert metrics["overload"]["max_pending"] == 4

        release.set()
        for c in clients:
            c.join(timeout=30)
        # every ADMITTED request succeeded (the gate sheds, never breaks
        # in-flight work); the coalescer served the 3 followers together
        assert [s for s, _, _ in results] == [200] * 4
        for _, data, _ in results:
            assert len(data["results"]) == 2

        status, metrics, _ = _req_full(port, "GET", "/metrics")
        assert metrics["overload"]["pending_depth"] == 0
        assert metrics["overload"]["peak_depth"] == 4
        assert metrics["routes"]["/v1/topk"]["errors"] == 20
        assert metrics["routes"]["/v1/topk"]["count"] == 24
    finally:
        release.set()
        server.shutdown()
        thread.join(timeout=10)
