// sgld-gateway: native model-routing gateway (C++).
//
// Reference analog: sgl-model-gateway/ (~89k LoC Rust) — OpenAI-compatible
// HTTP routing across worker fleets with LB policies, health checking,
// circuit breakers, retries and Prometheus metrics
// (sgl-model-gateway/README.md, src/routers/http/, src/core/).
//
// TPU-build re-design: a compact thread-per-connection HTTP/1.1 reverse
// proxy. The cache-aware policy core lives in tree.cpp (shared with the
// Python ctypes tests). Responses are streamed back chunk-by-chunk, so SSE
// token streaming passes through unbuffered.
//
// Endpoints:
//   * (any path)            -> proxied to a selected worker
//   GET  /gateway/workers   -> worker list + health/load/footprint JSON
//   POST /gateway/add_worker?url=http://h:p
//   POST /gateway/remove_worker?url=http://h:p
//   GET  /metrics           -> Prometheus text
//   GET  /gateway/health    -> gateway liveness

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <signal.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace gw {
class Tree;
struct CacheAwareConfig {
    double cache_threshold = 0.5;
    int64_t balance_abs_threshold = 32;
    double balance_rel_threshold = 1.0001;
    int64_t max_tree_size = 1 << 24;
};
int cache_aware_select(Tree*, const CacheAwareConfig&, const std::string&,
                       const int64_t*, const uint8_t*, int);
}  // namespace gw
extern "C" {
void* gw_tree_new();
void gw_tree_remove_tenant(void*, int);
void gw_tree_evict_by_size(void*, int64_t);
int64_t gw_tree_tenant_chars(void*, int);
int gw_cache_aware_select_ids(void*, const char*, int64_t, const int64_t*,
                              const uint8_t*, const int*, int, double,
                              int64_t, double);
}

namespace {

struct Worker {
    int id = 0;  // stable tenant id (survives worker list mutation)
    std::string host;
    int port = 0;
    std::string url;
    std::atomic<bool> healthy{true};
    std::atomic<int64_t> load{0};
    std::atomic<int64_t> consecutive_failures{0};
    std::atomic<int64_t> requests{0};
    std::atomic<int64_t> failures{0};
    // circuit breaker: open until this monotonic-ms deadline
    std::atomic<int64_t> cb_open_until_ms{0};
    std::atomic<bool> removed{false};
};

struct Config {
    int port = 30080;
    std::string policy = "cache_aware";
    double cache_threshold = 0.5;
    int64_t balance_abs = 32;
    double balance_rel = 1.0001;
    int64_t max_tree_size = 1 << 24;
    int health_interval_s = 5;
    int cb_failure_threshold = 3;
    int cb_cooldown_s = 10;
    int max_retries = 3;
    int connect_timeout_ms = 2000;
    // rate limiting (reference analog: sgl-model-gateway/src/core/
    // token_bucket.rs + middleware.rs concurrency_limit_middleware)
    double rate_limit_rps = 0.0;   // 0 = disabled
    double rate_limit_burst = 0.0; // 0 = default to rps (min 1)
    int queue_timeout_ms = 0;      // 0 = reject immediately with 429
    int concurrency_limit = 0;     // 0 = disabled (semaphore mode)
};

Config g_cfg;
std::mutex g_workers_mu;
std::vector<std::shared_ptr<Worker>> g_workers;
void* g_tree = nullptr;
std::atomic<uint64_t> g_rr{0};
std::atomic<int> g_next_worker_id{0};
std::atomic<int64_t> g_requests_total{0};
std::atomic<int64_t> g_retries_total{0};
std::atomic<int64_t> g_errors_total{0};

int64_t now_ms() {
    return std::chrono::duration_cast<std::chrono::milliseconds>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

// ---------------- token-bucket rate limiter ----------------
// Reference analog: sgl-model-gateway/src/core/token_bucket.rs (smooth
// refill + burst capacity) with the middleware's queue-with-timeout
// behavior (middleware.rs concurrency_limit_middleware). refill_rate=0
// gives pure concurrency limiting: tokens only come back via release().

class TokenBucket {
  public:
    TokenBucket(double capacity, double refill_rate)
        : capacity_(capacity), refill_rate_(refill_rate), tokens_(capacity),
          last_refill_ms_(now_ms()) {}

    bool acquire(int timeout_ms) {
        std::unique_lock<std::mutex> lk(mu_);
        int64_t deadline = now_ms() + timeout_ms;
        for (;;) {
            refill_locked();
            if (tokens_ >= 1.0) {
                tokens_ -= 1.0;
                return true;
            }
            int64_t left = deadline - now_ms();
            if (left <= 0) return false;
            cv_.wait_for(lk, std::chrono::milliseconds(
                                 std::min<int64_t>(left, 20)));
        }
    }

    void release() {
        std::lock_guard<std::mutex> lk(mu_);
        tokens_ = std::min(capacity_, tokens_ + 1.0);
        cv_.notify_one();
    }

  private:
    void refill_locked() {
        if (refill_rate_ <= 0.0) return;
        int64_t t = now_ms();
        tokens_ = std::min(
            capacity_, tokens_ + refill_rate_ * (t - last_refill_ms_) / 1e3);
        last_refill_ms_ = t;
    }

    double capacity_;
    double refill_rate_;
    double tokens_;
    int64_t last_refill_ms_;
    std::mutex mu_;
    std::condition_variable cv_;
};

std::unique_ptr<TokenBucket> g_rate_bucket;   // refill = rps
std::unique_ptr<TokenBucket> g_concurrency;   // refill = 0 (semaphore)
std::atomic<int64_t> g_rate_limited_total{0};

std::vector<std::shared_ptr<Worker>> snapshot_workers() {
    std::lock_guard<std::mutex> g(g_workers_mu);
    return g_workers;
}

// ---------------- tiny HTTP helpers ----------------

int connect_to(const std::string& host, int port, int timeout_ms) {
    struct addrinfo hints = {}, *res = nullptr;
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    char ps[16];
    snprintf(ps, sizeof(ps), "%d", port);
    if (getaddrinfo(host.c_str(), ps, &hints, &res) != 0) return -1;
    int fd = -1;
    for (auto* p = res; p; p = p->ai_next) {
        fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
        if (fd < 0) continue;
        struct timeval tv = {timeout_ms / 1000, (timeout_ms % 1000) * 1000};
        setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
        setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
        int one = 1;
        setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
        if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
        close(fd);
        fd = -1;
    }
    freeaddrinfo(res);
    return fd;
}

bool send_all(int fd, const char* buf, size_t n) {
    size_t off = 0;
    while (off < n) {
        ssize_t w = send(fd, buf + off, n - off, MSG_NOSIGNAL);
        if (w <= 0) return false;
        off += static_cast<size_t>(w);
    }
    return true;
}

// read until \r\n\r\n; returns header block, leaves extra bytes in `extra`
bool read_head(int fd, std::string* head, std::string* extra) {
    char buf[8192];
    std::string acc;
    while (acc.find("\r\n\r\n") == std::string::npos) {
        ssize_t r = recv(fd, buf, sizeof(buf), 0);
        if (r <= 0) return false;
        acc.append(buf, static_cast<size_t>(r));
        if (acc.size() > (16u << 20)) return false;
    }
    size_t pos = acc.find("\r\n\r\n");
    *head = acc.substr(0, pos + 4);
    *extra = acc.substr(pos + 4);
    return true;
}

std::string header_value(const std::string& head, const std::string& name) {
    std::string lower;
    lower.reserve(head.size());
    for (char c : head) lower += static_cast<char>(tolower(c));
    std::string key = "\r\n" + name + ":";
    for (auto& c : key) c = static_cast<char>(tolower(c));
    size_t p = lower.find(key);
    if (p == std::string::npos) return "";
    p += key.size();
    size_t e = head.find("\r\n", p);
    std::string v = head.substr(p, e - p);
    size_t a = v.find_first_not_of(" \t");
    if (a == std::string::npos) return "";
    return v.substr(a);
}

void respond(int fd, int code, const std::string& status,
             const std::string& body,
             const std::string& ctype = "application/json") {
    std::ostringstream ss;
    ss << "HTTP/1.1 " << code << " " << status << "\r\n"
       << "Content-Type: " << ctype << "\r\n"
       << "Content-Length: " << body.size() << "\r\n"
       << "Connection: close\r\n\r\n"
       << body;
    std::string s = ss.str();
    send_all(fd, s.data(), s.size());
}

// Extract routing text from a JSON request body: concatenates the values of
// "text" / "prompt" / "input" / "content" string fields (crude scan, enough
// for cache locality — reference gateway similarly routes on raw text,
// sgl-model-gateway/src/policies/cache_aware.rs).
std::string extract_route_text(const std::string& body) {
    static const char* keys[] = {"\"prompt\"", "\"text\"", "\"input\"",
                                 "\"content\""};
    std::string out;
    for (const char* key : keys) {
        size_t p = 0;
        while ((p = body.find(key, p)) != std::string::npos) {
            p += strlen(key);
            while (p < body.size() && (body[p] == ' ' || body[p] == ':'))
                p++;
            if (p >= body.size() || body[p] != '"') continue;
            p++;
            std::string s;
            while (p < body.size() && body[p] != '"') {
                if (body[p] == '\\' && p + 1 < body.size()) p++;
                s += body[p++];
            }
            out += s;
        }
        if (!out.empty()) break;
    }
    return out;
}

// ---------------- selection policies ----------------

int select_worker(const std::vector<std::shared_ptr<Worker>>& ws,
                  const std::string& route_text) {
    int n = static_cast<int>(ws.size());
    if (n == 0) return -1;
    std::vector<uint8_t> healthy(n);
    std::vector<int64_t> loads(n);
    int n_healthy = 0;
    for (int i = 0; i < n; i++) {
        bool h = ws[i]->healthy.load() &&
                 ws[i]->cb_open_until_ms.load() <= now_ms();
        healthy[i] = h ? 1 : 0;
        loads[i] = ws[i]->load.load();
        n_healthy += h;
    }
    if (n_healthy == 0) return -1;
    const std::string& pol = g_cfg.policy;
    if (pol == "cache_aware") {
        std::vector<int> ids(n);
        for (int i = 0; i < n; i++) ids[i] = ws[i]->id;
        return gw_cache_aware_select_ids(
            g_tree, route_text.data(),
            static_cast<int64_t>(route_text.size()), loads.data(),
            healthy.data(), ids.data(), n, g_cfg.cache_threshold,
            g_cfg.balance_abs, g_cfg.balance_rel);
    }
    if (pol == "round_robin") {
        for (int k = 0; k < n; k++) {
            int i = static_cast<int>(g_rr.fetch_add(1) % n);
            if (healthy[i]) return i;
        }
        return -1;
    }
    if (pol == "shortest_queue") {
        int best = -1;
        for (int i = 0; i < n; i++)
            if (healthy[i] && (best < 0 || loads[i] < loads[best])) best = i;
        return best;
    }
    if (pol == "power_of_two") {
        uint64_t a = g_rr.fetch_add(1), b = g_rr.fetch_add(1);
        int i = static_cast<int>(a % n), j = static_cast<int>(b % n);
        if (!healthy[i]) i = j;
        if (!healthy[j]) j = i;
        if (!healthy[i]) return select_worker(ws, route_text);
        return loads[i] <= loads[j] ? i : j;
    }
    if (pol == "consistent_hash") {
        std::hash<std::string> h;
        size_t start = h(route_text);
        for (int k = 0; k < n; k++) {
            int i = static_cast<int>((start + k) % n);
            if (healthy[i]) return i;
        }
        return -1;
    }
    // random (default fallback)
    for (int k = 0; k < 2 * n; k++) {
        int i = static_cast<int>(
            (now_ms() * 1103515245u + g_rr.fetch_add(1)) % n);
        if (healthy[i]) return i;
    }
    return -1;
}

void record_failure(const std::shared_ptr<Worker>& w) {
    w->failures.fetch_add(1);
    int64_t f = w->consecutive_failures.fetch_add(1) + 1;
    if (f >= g_cfg.cb_failure_threshold) {
        w->cb_open_until_ms.store(now_ms() + g_cfg.cb_cooldown_s * 1000);
    }
}

void record_success(const std::shared_ptr<Worker>& w) {
    w->consecutive_failures.store(0);
}

// ---------------- proxy ----------------

void proxy_request(int cfd, const std::string& head, const std::string& body,
                   const std::string& route_text) {
    g_requests_total.fetch_add(1);
    for (int attempt = 0; attempt < g_cfg.max_retries; attempt++) {
        auto ws = snapshot_workers();
        int wi = select_worker(ws, route_text);
        if (wi < 0) {
            respond(cfd, 503, "Service Unavailable",
                    "{\"error\":\"no healthy workers\"}");
            g_errors_total.fetch_add(1);
            return;
        }
        auto w = ws[wi];
        w->load.fetch_add(1);
        w->requests.fetch_add(1);
        int ufd = connect_to(w->host, w->port, g_cfg.connect_timeout_ms);
        if (ufd < 0) {
            w->load.fetch_sub(1);
            record_failure(w);
            g_retries_total.fetch_add(1);
            continue;
        }
        // rewrite Host + force close; forward verbatim otherwise
        std::string h = head;
        size_t hp;
        std::string lower;
        for (char c : h) lower += static_cast<char>(tolower(c));
        if ((hp = lower.find("\r\nhost:")) != std::string::npos) {
            size_t he = h.find("\r\n", hp + 2);
            h = h.substr(0, hp) + h.substr(he);
        }
        size_t line_end = h.find("\r\n");
        h.insert(line_end + 2,
                 "Host: " + w->host + ":" + std::to_string(w->port) +
                     "\r\nConnection: close\r\n");
        bool ok = send_all(ufd, h.data(), h.size()) &&
                  (body.empty() || send_all(ufd, body.data(), body.size()));
        if (!ok) {
            close(ufd);
            w->load.fetch_sub(1);
            record_failure(w);
            g_retries_total.fetch_add(1);
            continue;
        }
        // stream the response back (SSE-safe: forward as chunks arrive)
        char buf[16384];
        bool any = false;
        // upstream read timeout: generous for long generations
        struct timeval tv = {600, 0};
        setsockopt(ufd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
        while (true) {
            ssize_t r = recv(ufd, buf, sizeof(buf), 0);
            if (r <= 0) break;
            any = true;
            if (!send_all(cfd, buf, static_cast<size_t>(r))) break;
        }
        close(ufd);
        w->load.fetch_sub(1);
        if (any) {
            record_success(w);
            return;
        }
        record_failure(w);
        g_retries_total.fetch_add(1);
    }
    respond(cfd, 502, "Bad Gateway", "{\"error\":\"all retries failed\"}");
    g_errors_total.fetch_add(1);
}

// ---------------- admin / metrics ----------------

bool parse_url(const std::string& url, std::string* host, int* port) {
    std::string u = url;
    size_t p = u.find("://");
    if (p != std::string::npos) u = u.substr(p + 3);
    p = u.find('/');
    if (p != std::string::npos) u = u.substr(0, p);
    p = u.find(':');
    if (p == std::string::npos) return false;
    *host = u.substr(0, p);
    *port = atoi(u.c_str() + p + 1);
    return *port > 0;
}

void add_worker(const std::string& url) {
    auto w = std::make_shared<Worker>();
    if (!parse_url(url, &w->host, &w->port)) return;
    w->url = url;
    w->id = g_next_worker_id.fetch_add(1);
    std::lock_guard<std::mutex> g(g_workers_mu);
    for (auto& e : g_workers)
        if (e->url == url) return;
    g_workers.push_back(w);
}

void remove_worker(const std::string& url) {
    std::lock_guard<std::mutex> g(g_workers_mu);
    for (size_t i = 0; i < g_workers.size(); i++) {
        if (g_workers[i]->url == url) {
            gw_tree_remove_tenant(g_tree, g_workers[i]->id);
            g_workers[i]->removed.store(true);
            g_workers.erase(g_workers.begin() + static_cast<long>(i));
            return;
        }
    }
}

std::string workers_json() {
    auto ws = snapshot_workers();
    std::ostringstream ss;
    ss << "{\"workers\":[";
    for (size_t i = 0; i < ws.size(); i++) {
        if (i) ss << ",";
        ss << "{\"url\":\"" << ws[i]->url << "\",\"healthy\":"
           << (ws[i]->healthy.load() ? "true" : "false")
           << ",\"load\":" << ws[i]->load.load()
           << ",\"requests\":" << ws[i]->requests.load()
           << ",\"failures\":" << ws[i]->failures.load()
           << ",\"tree_chars\":"
           << gw_tree_tenant_chars(g_tree, ws[i]->id) << "}";
    }
    ss << "],\"policy\":\"" << g_cfg.policy << "\"}";
    return ss.str();
}

std::string metrics_text() {
    auto ws = snapshot_workers();
    std::ostringstream ss;
    ss << "# TYPE sgld_gateway_requests_total counter\n"
       << "sgld_gateway_requests_total " << g_requests_total.load() << "\n"
       << "# TYPE sgld_gateway_retries_total counter\n"
       << "sgld_gateway_retries_total " << g_retries_total.load() << "\n"
       << "# TYPE sgld_gateway_errors_total counter\n"
       << "sgld_gateway_errors_total " << g_errors_total.load() << "\n"
       << "# TYPE sgld_gateway_rate_limited_total counter\n"
       << "sgld_gateway_rate_limited_total " << g_rate_limited_total.load()
       << "\n";
    for (auto& w : ws) {
        ss << "sgld_gateway_worker_requests_total{worker=\"" << w->url
           << "\"} " << w->requests.load() << "\n"
           << "sgld_gateway_worker_load{worker=\"" << w->url << "\"} "
           << w->load.load() << "\n"
           << "sgld_gateway_worker_healthy{worker=\"" << w->url << "\"} "
           << (w->healthy.load() ? 1 : 0) << "\n";
    }
    return ss.str();
}

// ---------------- health checking ----------------

bool probe_health(const std::shared_ptr<Worker>& w) {
    int fd = connect_to(w->host, w->port, 1000);
    if (fd < 0) return false;
    std::string req = "GET /health HTTP/1.1\r\nHost: " + w->host +
                      "\r\nConnection: close\r\n\r\n";
    bool ok = send_all(fd, req.data(), req.size());
    char buf[512];
    ssize_t r = ok ? recv(fd, buf, sizeof(buf) - 1, 0) : -1;
    close(fd);
    if (r <= 0) return false;
    buf[r] = 0;
    return strstr(buf, " 200 ") != nullptr || strstr(buf, " 404 ") != nullptr;
    // a 404 means the worker is up but has no /health route — count as alive
}

void health_loop() {
    while (true) {
        auto ws = snapshot_workers();
        for (auto& w : ws) {
            bool ok = probe_health(w);
            w->healthy.store(ok);
            if (ok) w->consecutive_failures.store(0);
        }
        gw_tree_evict_by_size(g_tree, g_cfg.max_tree_size);
        std::this_thread::sleep_for(
            std::chrono::seconds(g_cfg.health_interval_s));
    }
}

// ---------------- service discovery ----------------
// Reference analog: sgl-model-gateway/src/service_discovery.rs (k8s
// endpoint watching). File-based: a sidecar (or operator) maintains a text
// file of worker URLs, one per line; the gateway polls it and reconciles
// the worker set — adds appear, removals drain. '#' lines are comments.

std::string g_discovery_file;
int g_discovery_interval_s = 2;

void discovery_loop() {
    std::string last_contents;
    while (true) {
        FILE* f = fopen(g_discovery_file.c_str(), "r");
        if (f) {
            std::string contents;
            char buf[4096];
            size_t n;
            while ((n = fread(buf, 1, sizeof(buf), f)) > 0)
                contents.append(buf, n);
            fclose(f);
            if (contents != last_contents) {
                last_contents = contents;
                std::vector<std::string> want;
                std::istringstream ss(contents);
                std::string line;
                while (std::getline(ss, line)) {
                    while (!line.empty() &&
                           (line.back() == '\r' || line.back() == ' '))
                        line.pop_back();
                    if (line.empty() || line[0] == '#') continue;
                    want.push_back(line);
                }
                // reconcile
                std::vector<std::string> current;
                for (auto& w : snapshot_workers()) current.push_back(w->url);
                for (auto& u : want) {
                    bool have = false;
                    for (auto& c : current)
                        if (c == u) have = true;
                    if (!have) {
                        add_worker(u);
                        fprintf(stderr, "discovery: +%s\n", u.c_str());
                    }
                }
                for (auto& c : current) {
                    bool keep = false;
                    for (auto& u : want)
                        if (u == c) keep = true;
                    if (!keep) {
                        remove_worker(c);
                        fprintf(stderr, "discovery: -%s\n", c.c_str());
                    }
                }
            }
        }
        std::this_thread::sleep_for(
            std::chrono::seconds(g_discovery_interval_s));
    }
}

// ---------------- connection handling ----------------

void handle_conn(int cfd) {
    std::string head, extra;
    if (!read_head(cfd, &head, &extra)) {
        close(cfd);
        return;
    }
    // request line
    size_t sp1 = head.find(' ');
    size_t sp2 = head.find(' ', sp1 + 1);
    std::string method = head.substr(0, sp1);
    std::string path = head.substr(sp1 + 1, sp2 - sp1 - 1);

    // admin routes handled locally
    if (path.rfind("/gateway/health", 0) == 0) {
        respond(cfd, 200, "OK", "{\"status\":\"ok\"}");
        close(cfd);
        return;
    }
    if (path.rfind("/gateway/workers", 0) == 0 && method == "GET") {
        respond(cfd, 200, "OK", workers_json());
        close(cfd);
        return;
    }
    if (path.rfind("/gateway/add_worker", 0) == 0) {
        size_t q = path.find("url=");
        if (q != std::string::npos) add_worker(path.substr(q + 4));
        respond(cfd, 200, "OK", workers_json());
        close(cfd);
        return;
    }
    if (path.rfind("/gateway/remove_worker", 0) == 0) {
        size_t q = path.find("url=");
        if (q != std::string::npos) remove_worker(path.substr(q + 4));
        respond(cfd, 200, "OK", workers_json());
        close(cfd);
        return;
    }
    if (path == "/metrics" && method == "GET") {
        respond(cfd, 200, "OK", metrics_text(), "text/plain");
        close(cfd);
        return;
    }

    // read the body (Content-Length only; no chunked requests)
    std::string body = extra;
    std::string cl = header_value(head, "Content-Length");
    size_t want = cl.empty() ? 0 : static_cast<size_t>(atoll(cl.c_str()));
    char buf[16384];
    while (body.size() < want) {
        ssize_t r = recv(cfd, buf, sizeof(buf), 0);
        if (r <= 0) break;
        body.append(buf, static_cast<size_t>(r));
    }
    // rate / concurrency limiting before worker selection (429 JSON like
    // the reference middleware; a queued request waits up to
    // --queue-timeout-ms for a token)
    if (g_rate_bucket && !g_rate_bucket->acquire(g_cfg.queue_timeout_ms)) {
        g_rate_limited_total.fetch_add(1);
        respond(cfd, 429, "Too Many Requests",
                "{\"error\":\"Rate limit exceeded\"}");
        close(cfd);
        return;
    }
    bool held_concurrency = false;
    if (g_concurrency) {
        if (!g_concurrency->acquire(g_cfg.queue_timeout_ms)) {
            g_rate_limited_total.fetch_add(1);
            respond(cfd, 429, "Too Many Requests",
                    "{\"error\":\"Concurrency limit exceeded\"}");
            close(cfd);
            return;
        }
        held_concurrency = true;
    }
    proxy_request(cfd, head, body, extract_route_text(body));
    // the proxy streams the full response (including SSE) synchronously,
    // so releasing here matches the reference's TokenGuardBody semantics
    if (held_concurrency) g_concurrency->release();
    close(cfd);
}

}  // namespace

int main(int argc, char** argv) {
    signal(SIGPIPE, SIG_IGN);
    g_tree = gw_tree_new();
    std::vector<std::string> worker_urls;
    for (int i = 1; i < argc; i++) {
        std::string a = argv[i];
        auto next = [&]() { return std::string(argv[++i]); };
        if (a == "--port")
            g_cfg.port = atoi(next().c_str());
        else if (a == "--worker")
            worker_urls.push_back(next());
        else if (a == "--policy")
            g_cfg.policy = next();
        else if (a == "--cache-threshold")
            g_cfg.cache_threshold = atof(next().c_str());
        else if (a == "--balance-abs-threshold")
            g_cfg.balance_abs = atoll(next().c_str());
        else if (a == "--balance-rel-threshold")
            g_cfg.balance_rel = atof(next().c_str());
        else if (a == "--max-tree-size")
            g_cfg.max_tree_size = atoll(next().c_str());
        else if (a == "--health-interval")
            g_cfg.health_interval_s = atoi(next().c_str());
        else if (a == "--cb-failure-threshold")
            g_cfg.cb_failure_threshold = atoi(next().c_str());
        else if (a == "--cb-cooldown")
            g_cfg.cb_cooldown_s = atoi(next().c_str());
        else if (a == "--max-retries")
            g_cfg.max_retries = atoi(next().c_str());
        else if (a == "--discovery-file")
            g_discovery_file = next();
        else if (a == "--discovery-interval")
            g_discovery_interval_s = atoi(next().c_str());
        else if (a == "--rate-limit")
            g_cfg.rate_limit_rps = atof(next().c_str());
        else if (a == "--rate-limit-burst")
            g_cfg.rate_limit_burst = atof(next().c_str());
        else if (a == "--queue-timeout-ms")
            g_cfg.queue_timeout_ms = atoi(next().c_str());
        else if (a == "--concurrency-limit")
            g_cfg.concurrency_limit = atoi(next().c_str());
    }
    for (auto& u : worker_urls) add_worker(u);
    if (g_cfg.rate_limit_rps > 0.0) {
        double burst = g_cfg.rate_limit_burst > 0.0
                           ? g_cfg.rate_limit_burst
                           : std::max(1.0, g_cfg.rate_limit_rps);
        g_rate_bucket.reset(new TokenBucket(burst, g_cfg.rate_limit_rps));
    }
    if (g_cfg.concurrency_limit > 0)
        g_concurrency.reset(
            new TokenBucket(g_cfg.concurrency_limit, 0.0));

    int sfd = socket(AF_INET, SOCK_STREAM, 0);
    int one = 1;
    setsockopt(sfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    struct sockaddr_in addr = {};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_ANY);
    addr.sin_port = htons(static_cast<uint16_t>(g_cfg.port));
    if (bind(sfd, reinterpret_cast<struct sockaddr*>(&addr), sizeof(addr)) <
        0) {
        perror("bind");
        return 1;
    }
    listen(sfd, 256);
    fprintf(stderr, "sgld-gateway listening on :%d policy=%s workers=%zu\n",
            g_cfg.port, g_cfg.policy.c_str(), worker_urls.size());
    std::thread(health_loop).detach();
    if (!g_discovery_file.empty()) std::thread(discovery_loop).detach();
    while (true) {
        int cfd = accept(sfd, nullptr, nullptr);
        if (cfd < 0) continue;
        std::thread(handle_conn, cfd).detach();
    }
}
