// Approximate radix tree + load-balancing policy core for the model gateway.
//
// Reference analog: sgl-model-gateway/src/policies/{tree.rs,cache_aware.rs}
// (Rust). Re-designed in C++ with a plain C ABI so both the sgld-gateway
// binary and Python ctypes tests share one implementation.
//
// Semantics mirrored from the reference (observed behavior, not a port):
// - One compressed radix tree over raw request text; each node carries a
//   per-tenant (worker) last-access timestamp.
// - match_best(text): deepest prefix per tenant; returns the tenant with
//   the longest match.
// - Imbalance test: (max_load - min_load) > abs_threshold AND
//   max_load > rel_threshold * min_load  -> shortest-queue routing.
// - Balanced: match rate > cache_threshold -> highest-match tenant; else
//   the tenant with the smallest tree footprint (most available cache).
// - evict_tenant_by_size(max): per tenant, drop LRU leaves until its
//   footprint is under the cap.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace gw {

using Clock = std::atomic<uint64_t>;
static Clock g_tick{1};

struct Node {
    std::string seg;                       // compressed edge label
    Node* parent = nullptr;
    std::unordered_map<char, std::unique_ptr<Node>> children;
    std::unordered_map<int, uint64_t> tenant_ts;  // tenant -> last access

    bool has_tenant(int t) const { return tenant_ts.count(t) != 0; }
};

class Tree {
  public:
    Tree() : root_(new Node()) {}

    void insert(const std::string& text, int tenant) {
        std::lock_guard<std::mutex> g(mu_);
        uint64_t ts = g_tick.fetch_add(1);
        Node* cur = root_.get();
        touch(cur, tenant, ts);
        size_t i = 0;
        while (i < text.size()) {
            char c = text[i];
            auto it = cur->children.find(c);
            if (it == cur->children.end()) {
                auto child = std::make_unique<Node>();
                child->seg = text.substr(i);
                child->parent = cur;
                touch(child.get(), tenant, ts);
                tenant_chars_[tenant] += child->seg.size();
                cur->children.emplace(c, std::move(child));
                return;
            }
            Node* child = it->second.get();
            size_t k = 0;
            while (k < child->seg.size() && i + k < text.size() &&
                   child->seg[k] == text[i + k])
                k++;
            if (k < child->seg.size()) {
                // split the edge at k: mid keeps the shared prefix and
                // inherits the tenants spanning the original edge
                // (footprints unchanged: the split redistributes chars)
                auto mid = std::make_unique<Node>();
                mid->seg = child->seg.substr(0, k);
                mid->parent = cur;
                mid->tenant_ts = child->tenant_ts;
                child->seg = child->seg.substr(k);
                child->parent = mid.get();
                mid->children.emplace(child->seg[0], std::move(it->second));
                Node* midp = mid.get();
                cur->children[c] = std::move(mid);
                child = midp;
            }
            // child's edge is now fully matched by text[i..i+k)
            bool had = child->has_tenant(tenant);
            touch(child, tenant, ts);
            if (!had) tenant_chars_[tenant] += child->seg.size();
            cur = child;
            i += k;
        }
    }

    // Longest prefix match per tenant; returns (tenant, matched_len).
    // Returns tenant=-1 when the tree is empty of tenants.
    void match_best(const std::string& text, const std::vector<int>& allowed,
                    int* tenant_out, int64_t* len_out) {
        std::lock_guard<std::mutex> g(mu_);
        std::unordered_map<int, int64_t> best;
        Node* cur = root_.get();
        int64_t depth = 0;
        for (int t : allowed)
            if (cur->has_tenant(t)) best[t] = 0;
        size_t i = 0;
        while (i < text.size()) {
            auto it = cur->children.find(text[i]);
            if (it == cur->children.end()) break;
            Node* child = it->second.get();
            size_t k = 0;
            while (k < child->seg.size() && i + k < text.size() &&
                   child->seg[k] == text[i + k])
                k++;
            int64_t reach = depth + static_cast<int64_t>(k);
            for (int t : allowed)
                if (child->has_tenant(t)) best[t] = reach;
            if (k < child->seg.size()) break;
            depth = reach;
            i += k;
            cur = child;
        }
        int bt = -1;
        int64_t bl = -1;
        for (auto& kv : best) {
            if (kv.second > bl ||
                (kv.second == bl && (bt == -1 || kv.first < bt))) {
                bt = kv.first;
                bl = kv.second;
            }
        }
        *tenant_out = bt;
        *len_out = bl < 0 ? 0 : bl;
    }

    int64_t tenant_chars(int tenant) {
        std::lock_guard<std::mutex> g(mu_);
        auto it = tenant_chars_.find(tenant);
        return it == tenant_chars_.end() ? 0 : it->second;
    }

    // Drop LRU leaves of each tenant until its footprint <= max_chars.
    void evict_by_size(int64_t max_chars) {
        std::lock_guard<std::mutex> g(mu_);
        std::vector<int> tenants;
        for (auto& kv : tenant_chars_)
            if (kv.second > max_chars) tenants.push_back(kv.first);
        for (int t : tenants) {
            // collect this tenant's leaf nodes (no child carries t)
            while (tenant_chars_[t] > max_chars) {
                std::vector<std::pair<uint64_t, Node*>> leaves;
                collect_leaves(root_.get(), t, &leaves);
                if (leaves.empty()) break;
                std::sort(leaves.begin(), leaves.end(),
                          [](auto& a, auto& b) { return a.first < b.first; });
                bool removed = false;
                for (auto& pr : leaves) {
                    if (tenant_chars_[t] <= max_chars) break;
                    remove_tenant_from_node(pr.second, t);
                    removed = true;
                }
                if (!removed) break;
            }
        }
        prune();
    }

    void remove_tenant(int tenant) {
        std::lock_guard<std::mutex> g(mu_);
        remove_tenant_rec(root_.get(), tenant);
        tenant_chars_.erase(tenant);
        prune();
    }

    int64_t total_nodes() {
        std::lock_guard<std::mutex> g(mu_);
        return count(root_.get());
    }

  private:
    static void touch(Node* n, int tenant, uint64_t ts) {
        n->tenant_ts[tenant] = ts;
    }

    void collect_leaves(Node* n, int tenant,
                        std::vector<std::pair<uint64_t, Node*>>* out) {
        for (auto& kv : n->children) {
            Node* c = kv.second.get();
            if (!c->has_tenant(tenant)) continue;
            bool leaf = true;
            for (auto& kv2 : c->children)
                if (kv2.second->has_tenant(tenant)) { leaf = false; break; }
            if (leaf)
                out->emplace_back(c->tenant_ts[tenant], c);
            else
                collect_leaves(c, tenant, out);
        }
    }

    void remove_tenant_from_node(Node* n, int tenant) {
        if (n->tenant_ts.erase(tenant))
            tenant_chars_[tenant] -= static_cast<int64_t>(n->seg.size());
    }

    void remove_tenant_rec(Node* n, int tenant) {
        remove_tenant_from_node(n, tenant);
        for (auto& kv : n->children) remove_tenant_rec(kv.second.get(), tenant);
    }

    // remove nodes with no tenants (bottom-up)
    void prune() { prune_rec(root_.get()); }
    static void prune_rec(Node* n) {
        for (auto it = n->children.begin(); it != n->children.end();) {
            prune_rec(it->second.get());
            Node* c = it->second.get();
            if (c->tenant_ts.empty() && c->children.empty())
                it = n->children.erase(it);
            else
                ++it;
        }
    }

    static int64_t count(Node* n) {
        int64_t c = 1;
        for (auto& kv : n->children) c += count(kv.second.get());
        return c;
    }

    std::mutex mu_;
    std::unique_ptr<Node> root_;
    std::unordered_map<int, int64_t> tenant_chars_;
};

// ---------------- cache-aware selection ----------------

struct CacheAwareConfig {
    double cache_threshold = 0.5;
    int64_t balance_abs_threshold = 32;
    double balance_rel_threshold = 1.0001;
    int64_t max_tree_size = 1 << 24;  // chars per tenant
};

// Select a worker position (0..n-1). loads/healthy/tenant_ids are arrays of
// n workers; tenant_ids are STABLE worker ids (tree tenants survive worker
// list mutation). With tenant_ids == nullptr, position == tenant id.
// Inserts the text for the chosen tenant.
int cache_aware_select(Tree* tree, const CacheAwareConfig& cfg,
                       const std::string& text, const int64_t* loads,
                       const uint8_t* healthy, int n,
                       const int* tenant_ids = nullptr) {
    std::vector<int> idx;
    for (int i = 0; i < n; i++)
        if (healthy[i]) idx.push_back(i);
    if (idx.empty()) return -1;
    auto tid = [&](int i) { return tenant_ids ? tenant_ids[i] : i; };

    int64_t mx = loads[idx[0]], mn = loads[idx[0]];
    for (int i : idx) { mx = std::max(mx, loads[i]); mn = std::min(mn, loads[i]); }
    int chosen = -1;
    bool imbalanced = (mx - mn) > cfg.balance_abs_threshold &&
                      static_cast<double>(mx) >
                          cfg.balance_rel_threshold * static_cast<double>(mn);
    if (imbalanced) {
        for (int i : idx)
            if (chosen < 0 || loads[i] < loads[chosen]) chosen = i;
    } else {
        std::vector<int> allow;
        for (int i : idx) allow.push_back(tid(i));
        int t = -1;
        int64_t mlen = 0;
        tree->match_best(text, allow, &t, &mlen);
        double rate = text.empty() ? 0.0
                                   : static_cast<double>(mlen) /
                                         static_cast<double>(text.size());
        if (t >= 0 && rate > cfg.cache_threshold) {
            for (int i : idx)
                if (tid(i) == t) { chosen = i; break; }
        }
        if (chosen < 0) {
            // most available cache: smallest tenant footprint
            for (int i : idx) {
                if (chosen < 0 || tree->tenant_chars(tid(i)) <
                                      tree->tenant_chars(tid(chosen)))
                    chosen = i;
            }
        }
    }
    if (chosen >= 0) tree->insert(text, tid(chosen));
    return chosen;
}

}  // namespace gw

// ---------------- C ABI ----------------

extern "C" {

void* gw_tree_new() { return new gw::Tree(); }
void gw_tree_free(void* t) { delete static_cast<gw::Tree*>(t); }

void gw_tree_insert(void* t, const char* text, int64_t len, int tenant) {
    static_cast<gw::Tree*>(t)->insert(std::string(text, len), tenant);
}

// allowed: tenant whitelist (n entries); tenant_out=-1 when none match
void gw_tree_match_best(void* t, const char* text, int64_t len,
                        const int* allowed, int n_allowed, int* tenant_out,
                        int64_t* len_out) {
    std::vector<int> allow(allowed, allowed + n_allowed);
    static_cast<gw::Tree*>(t)->match_best(std::string(text, len), allow,
                                          tenant_out, len_out);
}

int64_t gw_tree_tenant_chars(void* t, int tenant) {
    return static_cast<gw::Tree*>(t)->tenant_chars(tenant);
}

void gw_tree_evict_by_size(void* t, int64_t max_chars) {
    static_cast<gw::Tree*>(t)->evict_by_size(max_chars);
}

void gw_tree_remove_tenant(void* t, int tenant) {
    static_cast<gw::Tree*>(t)->remove_tenant(tenant);
}

int64_t gw_tree_total_nodes(void* t) {
    return static_cast<gw::Tree*>(t)->total_nodes();
}

int gw_cache_aware_select(void* t, const char* text, int64_t len,
                          const int64_t* loads, const uint8_t* healthy, int n,
                          double cache_threshold, int64_t abs_threshold,
                          double rel_threshold) {
    gw::CacheAwareConfig cfg;
    cfg.cache_threshold = cache_threshold;
    cfg.balance_abs_threshold = abs_threshold;
    cfg.balance_rel_threshold = rel_threshold;
    return gw::cache_aware_select(static_cast<gw::Tree*>(t), cfg,
                                  std::string(text, len), loads, healthy, n);
}

// variant with stable tenant ids per worker position
int gw_cache_aware_select_ids(void* t, const char* text, int64_t len,
                              const int64_t* loads, const uint8_t* healthy,
                              const int* tenant_ids, int n,
                              double cache_threshold, int64_t abs_threshold,
                              double rel_threshold) {
    gw::CacheAwareConfig cfg;
    cfg.cache_threshold = cache_threshold;
    cfg.balance_abs_threshold = abs_threshold;
    cfg.balance_rel_threshold = rel_threshold;
    return gw::cache_aware_select(static_cast<gw::Tree*>(t), cfg,
                                  std::string(text, len), loads, healthy, n,
                                  tenant_ids);
}

}  // extern "C"
