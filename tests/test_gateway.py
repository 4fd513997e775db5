"""Native gateway tests: cache-aware policy core (ctypes over
csrc/tree.cpp) + e2e reverse-proxy behavior of the sgld-gateway binary.

Reference analog: sgl-model-gateway/{tests,e2e_test} (Rust gateway suite);
policy semantics from src/policies/cache_aware.rs and tree.rs.
"""

import http.server
import json
import socket
import threading
import time
import urllib.request

import pytest

from sglang_diffusion_tpu.gateway import (
    ApproxTree,
    GatewayProcess,
    build,
)

pytestmark = pytest.mark.skipif(
    not build(), reason="C++ toolchain unavailable"
)


# ---------------- policy core ----------------

def test_tree_insert_match():
    t = ApproxTree()
    t.insert("hello world this is worker zero", 0)
    t.insert("hello there from worker one", 1)
    tenant, n = t.match_best("hello world this is", [0, 1])
    assert tenant == 0
    assert n == len("hello world this is")
    tenant, n = t.match_best("hello there", [0, 1])
    assert tenant == 1
    # restrict to tenant 0: the shared "hello " prefix still matches
    tenant, n = t.match_best("hello there", [0])
    assert tenant == 0
    assert n == len("hello ")


def test_tree_tenant_footprint_and_eviction():
    t = ApproxTree()
    t.insert("a" * 100, 0)
    t.insert("b" * 10, 1)
    assert t.tenant_chars(0) == 100
    assert t.tenant_chars(1) == 10
    t.evict_by_size(50)
    assert t.tenant_chars(0) <= 50
    assert t.tenant_chars(1) == 10  # under cap, untouched
    t.remove_tenant(1)
    assert t.tenant_chars(1) == 0
    _, n = t.match_best("b" * 10, [1])
    assert n == 0


def test_cache_aware_select_balanced_prefers_prefix_match():
    t = ApproxTree()
    t.insert("the quick brown fox jumps over the lazy dog", 2)
    # balanced loads -> prefix-match routing
    w = t.cache_aware_select(
        "the quick brown fox jumps over", loads=[0, 0, 0],
        healthy=[True, True, True],
    )
    assert w == 2


def test_cache_aware_select_low_match_goes_to_most_available():
    t = ApproxTree()
    t.insert("x" * 1000, 0)
    t.insert("y" * 10, 1)
    # no match for "zzz" -> smallest footprint tenant (2 has zero)
    w = t.cache_aware_select(
        "zzz completely new text", loads=[0, 0, 0],
        healthy=[True, True, True],
    )
    assert w == 2


def test_cache_aware_select_imbalanced_goes_shortest_queue():
    t = ApproxTree()
    t.insert("repeat me repeat me repeat me", 0)
    # worker 0 has a perfect match but is overloaded -> shortest queue
    w = t.cache_aware_select(
        "repeat me repeat me repeat me",
        loads=[100, 1, 50], healthy=[True, True, True],
        abs_threshold=32, rel_threshold=1.5,
    )
    assert w == 1


def test_cache_aware_select_skips_unhealthy():
    t = ApproxTree()
    t.insert("sticky prefix", 0)
    w = t.cache_aware_select(
        "sticky prefix", loads=[0, 0], healthy=[False, True]
    )
    assert w == 1
    w = t.cache_aware_select("x", loads=[0, 0], healthy=[False, False])
    assert w == -1


# ---------------- e2e proxy ----------------

class _EchoHandler(http.server.BaseHTTPRequestHandler):
    name = "?"

    def log_message(self, *a):  # silence
        pass

    def _respond(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self._respond({"worker": self.server.worker_name, "path": self.path})

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self._respond(
            {"worker": self.server.worker_name, "echo": body.decode()}
        )


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _start_worker(name):
    port = _free_port()
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), _EchoHandler)
    srv.worker_name = name
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, port


def _post(url, obj, timeout=5):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, timeout=5):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read().decode()


@pytest.fixture()
def gateway_two_workers():
    s1, p1 = _start_worker("w1")
    s2, p2 = _start_worker("w2")
    gport = _free_port()
    gw = GatewayProcess(
        gport,
        [f"http://127.0.0.1:{p1}", f"http://127.0.0.1:{p2}"],
        policy="cache_aware",
        health_interval=1,
    )
    assert gw.wait_ready()
    yield gw, gport, (s1, p1), (s2, p2)
    gw.shutdown()
    s1.shutdown()
    s2.shutdown()


def test_gateway_proxies_and_sticks_to_prefix(gateway_two_workers):
    gw, gport, _, _ = gateway_two_workers
    url = f"http://127.0.0.1:{gport}/generate"
    prompt = "a long shared prefix for cache affinity testing " * 3
    first = _post(url, {"text": prompt + "1"})["worker"]
    for i in range(2, 6):
        got = _post(url, {"text": prompt + str(i)})["worker"]
        assert got == first  # same prefix -> same worker
    # distinct text should eventually reach the other worker
    others = {
        _post(url, {"text": f"completely different {i} " * 4})["worker"]
        for i in range(6)
    }
    assert len(others | {first}) == 2


def test_gateway_failover_and_health(gateway_two_workers):
    gw, gport, (s1, p1), (s2, p2) = gateway_two_workers
    url = f"http://127.0.0.1:{gport}/generate"
    # kill worker 1; requests must fail over to worker 2
    s1.shutdown()
    time.sleep(2.5)  # health loop marks it down
    for i in range(4):
        got = _post(url, {"text": f"after failover {i}"})["worker"]
        assert got == "w2"
    workers = json.loads(_get(f"http://127.0.0.1:{gport}/gateway/workers"))
    state = {w["url"]: w["healthy"] for w in workers["workers"]}
    assert state[f"http://127.0.0.1:{p1}"] is False
    assert state[f"http://127.0.0.1:{p2}"] is True


def test_gateway_metrics_and_admin(gateway_two_workers):
    gw, gport, _, (s2, p2) = gateway_two_workers
    _post(f"http://127.0.0.1:{gport}/v1/completions", {"prompt": "hi"})
    m = _get(f"http://127.0.0.1:{gport}/metrics")
    assert "sgld_gateway_requests_total" in m
    assert "sgld_gateway_worker_healthy" in m
    # add/remove worker round-trip
    out = json.loads(
        _get(
            f"http://127.0.0.1:{gport}/gateway/add_worker?url=http://127.0.0.1:1"
        )
    )
    assert len(out["workers"]) == 3
    out = json.loads(
        _get(
            f"http://127.0.0.1:{gport}/gateway/remove_worker?url=http://127.0.0.1:1"
        )
    )
    assert len(out["workers"]) == 2


def test_gateway_discovery_file(tmp_path):
    """File-based service discovery (reference analog:
    sgl-model-gateway/src/service_discovery.rs k8s endpoint watching):
    worker set reconciles to the discovery file's contents."""
    s1, p1 = _start_worker("w1")
    s2, p2 = _start_worker("w2")
    disc = tmp_path / "workers.txt"
    disc.write_text(f"http://127.0.0.1:{p1}\n")
    gport = _free_port()
    gw = GatewayProcess(
        gport, [], policy="round_robin", health_interval=1,
        discovery_file=str(disc), discovery_interval=1,
    )
    try:
        assert gw.wait_ready()
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            ws = json.loads(_get(f"http://127.0.0.1:{gport}/gateway/workers"))
            if len(ws["workers"]) == 1:
                break
            time.sleep(0.3)
        assert len(ws["workers"]) == 1
        # add the second worker via the file
        disc.write_text(
            f"# fleet\nhttp://127.0.0.1:{p1}\nhttp://127.0.0.1:{p2}\n"
        )
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            ws = json.loads(_get(f"http://127.0.0.1:{gport}/gateway/workers"))
            if len(ws["workers"]) == 2:
                break
            time.sleep(0.3)
        assert len(ws["workers"]) == 2
        # remove the first
        disc.write_text(f"http://127.0.0.1:{p2}\n")
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            ws = json.loads(_get(f"http://127.0.0.1:{gport}/gateway/workers"))
            if len(ws["workers"]) == 1:
                break
            time.sleep(0.3)
        assert len(ws["workers"]) == 1
        assert str(p2) in ws["workers"][0]["url"]
        # traffic still flows
        out = _post(f"http://127.0.0.1:{gport}/generate", {"text": "x"})
        assert out["worker"] == "w2"
    finally:
        gw.shutdown()
        s1.shutdown()
        s2.shutdown()


def test_gateway_rate_limit_429_and_refill():
    """Token-bucket rate limiting (reference analog:
    sgl-model-gateway/src/core/token_bucket.rs + middleware.rs): burst
    tokens admit immediately, further requests 429, tokens refill over
    time; the 429 count is exported in /metrics."""
    s1, p1 = _start_worker("w1")
    gport = _free_port()
    gw = GatewayProcess(
        gport, [f"http://127.0.0.1:{p1}"], policy="round_robin",
        health_interval=1, rate_limit=2, rate_limit_burst=2,
    )
    try:
        assert gw.wait_ready()
        url = f"http://127.0.0.1:{gport}/generate"
        ok = limited = 0
        for i in range(8):
            try:
                _post(url, {"text": f"r{i}"})
                ok += 1
            except urllib.error.HTTPError as e:
                assert e.code == 429
                body = json.loads(e.read())
                assert "Rate limit" in body["error"]
                limited += 1
        assert ok >= 2  # burst admitted
        assert limited >= 1  # excess rejected
        # refill: after a wait, requests are admitted again
        time.sleep(1.2)
        _post(url, {"text": "after-refill"})
        metrics = _get(f"http://127.0.0.1:{gport}/metrics")
        assert "sgld_gateway_rate_limited_total" in metrics
        val = [l for l in metrics.splitlines()
               if l.startswith("sgld_gateway_rate_limited_total")][0]
        assert int(val.split()[-1]) == limited
    finally:
        gw.shutdown()
        s1.shutdown()


def test_gateway_concurrency_limit_queues():
    """--concurrency-limit behaves as a semaphore with queuing: with a
    generous queue timeout every request eventually succeeds even when
    issued concurrently beyond the limit."""
    s1, p1 = _start_worker("w1")
    gport = _free_port()
    gw = GatewayProcess(
        gport, [f"http://127.0.0.1:{p1}"], policy="round_robin",
        health_interval=1, concurrency_limit=2, queue_timeout_ms=5000,
    )
    try:
        assert gw.wait_ready()
        url = f"http://127.0.0.1:{gport}/generate"
        results = []

        def call(i):
            results.append(_post(url, {"text": f"c{i}"})["worker"])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=15)
        assert len(results) == 6
    finally:
        gw.shutdown()
        s1.shutdown()
