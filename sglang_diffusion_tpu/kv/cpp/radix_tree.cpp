// Native radix tree for RadixAttention prefix caching.
//
// TPU-build re-implementation of the behavior of the reference's C++ radix
// tree (srt/mem_cache/cpp_radix_tree/tree_v2.cpp + tree_v2_binding.cpp —
// pybind11 there; plain C ABI + ctypes here because the bare image has no
// pybind11). Semantics mirror kv/radix_cache.py exactly: page-aligned
// match/insert/split, lock refs, LRU leaf eviction. The Python wrapper
// (radix_cache_cpp.py) is drop-in for RadixCache and is property-tested
// against the Python tree.
//
// Build: make -C sglang_diffusion_tpu/kv/cpp  (produces libradixtree.so)

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <queue>
#include <vector>

namespace {

using Token = int32_t;
using Page = int32_t;

struct Node {
  Node* parent = nullptr;
  // children keyed by the first page of the edge
  std::map<std::vector<Token>, std::unique_ptr<Node>> children;
  std::vector<Token> tokens;  // multiple of page_size
  std::vector<Page> pages;
  int64_t lock_ref = 0;
  uint64_t last_access = 0;
};

struct Tree {
  int64_t page_size;
  Node root;
  uint64_t clock = 0;
  int64_t evictable_tokens = 0;
  int64_t protected_tokens = 0;
  // eviction results are staged here for the caller to drain
  std::vector<Page> freed;
};

std::vector<Token> edge_key(const Tree* t, const Token* tokens, int64_t n) {
  int64_t k = n < t->page_size ? n : t->page_size;
  return std::vector<Token>(tokens, tokens + k);
}

// number of whole pages of `child`'s edge matching `tokens[pos..n)`
int64_t match_pages(const Tree* t, const Node* child, const Token* tokens,
                    int64_t pos, int64_t n) {
  const int64_t ps = t->page_size;
  int64_t m = 0;
  const auto& et = child->tokens;
  while ((m + 1) * ps <= (int64_t)et.size() && pos + (m + 1) * ps <= n &&
         std::memcmp(et.data() + m * ps, tokens + pos + m * ps,
                     ps * sizeof(Token)) == 0) {
    m++;
  }
  return m;
}

Node* split_node(Tree* t, Node* parent, Node* child, int64_t n_pages) {
  const int64_t cut = n_pages * t->page_size;
  auto upper_owned = std::make_unique<Node>();
  Node* upper = upper_owned.get();
  upper->parent = parent;
  upper->tokens.assign(child->tokens.begin(), child->tokens.begin() + cut);
  upper->pages.assign(child->pages.begin(), child->pages.begin() + n_pages);
  upper->lock_ref = child->lock_ref;
  upper->last_access = child->last_access;

  auto child_key = edge_key(t, child->tokens.data(), child->tokens.size());
  auto it = parent->children.find(child_key);
  std::unique_ptr<Node> child_owned = std::move(it->second);
  parent->children.erase(it);

  child->tokens.erase(child->tokens.begin(), child->tokens.begin() + cut);
  child->pages.erase(child->pages.begin(), child->pages.begin() + n_pages);
  child->parent = upper;
  auto new_child_key = edge_key(t, child->tokens.data(), child->tokens.size());
  upper->children[new_child_key] = std::move(child_owned);

  auto upper_key = edge_key(t, upper->tokens.data(), upper->tokens.size());
  parent->children[upper_key] = std::move(upper_owned);
  return upper;
}

}  // namespace

extern "C" {

void* radix_tree_create(int64_t page_size) {
  Tree* t = new Tree();
  t->page_size = page_size;
  t->root.lock_ref = 1;
  return t;
}

void radix_tree_destroy(void* h) { delete static_cast<Tree*>(h); }

int64_t radix_tree_evictable_tokens(void* h) {
  return static_cast<Tree*>(h)->evictable_tokens;
}
int64_t radix_tree_protected_tokens(void* h) {
  return static_cast<Tree*>(h)->protected_tokens;
}

// match_prefix: writes up to max_pages page ids into out_pages, returns the
// count; writes the terminal node handle into out_node.
int64_t radix_tree_match_prefix(void* h, const Token* tokens, int64_t n,
                                Page* out_pages, int64_t max_pages,
                                void** out_node) {
  Tree* t = static_cast<Tree*>(h);
  const int64_t ps = t->page_size;
  n = n / ps * ps;
  Node* node = &t->root;
  int64_t pos = 0;
  int64_t count = 0;
  while (pos < n) {
    auto key = edge_key(t, tokens + pos, n - pos);
    auto it = node->children.find(key);
    if (it == node->children.end()) break;
    Node* child = it->second.get();
    int64_t m = match_pages(t, child, tokens, pos, n);
    if (m == 0) break;
    if (m * ps < (int64_t)child->tokens.size()) {
      child = split_node(t, node, child, m);
    }
    child->last_access = ++t->clock;
    for (Page p : child->pages) {
      if (count < max_pages) out_pages[count] = p;
      count++;
    }
    pos += child->tokens.size();
    node = child;
  }
  *out_node = node == &t->root ? nullptr : node;
  return count;
}

// insert: returns number of duplicate (already cached) tokens.
int64_t radix_tree_insert(void* h, const Token* tokens, int64_t n,
                          const Page* pages, int64_t n_pages) {
  Tree* t = static_cast<Tree*>(h);
  const int64_t ps = t->page_size;
  n = n / ps * ps;
  if (n / ps > n_pages) return -1;
  Node* node = &t->root;
  int64_t pos = 0;
  while (pos < n) {
    auto key = edge_key(t, tokens + pos, n - pos);
    auto it = node->children.find(key);
    if (it == node->children.end()) {
      auto child = std::make_unique<Node>();
      child->parent = node;
      child->tokens.assign(tokens + pos, tokens + n);
      child->pages.assign(pages + pos / ps, pages + n / ps);
      child->last_access = ++t->clock;
      t->evictable_tokens += child->tokens.size();
      node->children[key] = std::move(child);
      return pos;
    }
    Node* child = it->second.get();
    int64_t m = match_pages(t, child, tokens, pos, n);
    if (m == 0) {
      // same first-page key but differing content cannot happen (key == page)
      return pos;
    }
    if (m * ps < (int64_t)child->tokens.size()) {
      child = split_node(t, node, child, m);
    }
    child->last_access = ++t->clock;
    pos += child->tokens.size();
    node = child;
  }
  return pos;
}

void radix_tree_inc_lock(void* h, void* node_h) {
  Tree* t = static_cast<Tree*>(h);
  for (Node* n = static_cast<Node*>(node_h); n && n != &t->root;
       n = n->parent) {
    if (n->lock_ref == 0) {
      t->evictable_tokens -= n->tokens.size();
      t->protected_tokens += n->tokens.size();
    }
    n->lock_ref++;
  }
}

void radix_tree_dec_lock(void* h, void* node_h) {
  Tree* t = static_cast<Tree*>(h);
  for (Node* n = static_cast<Node*>(node_h); n && n != &t->root;
       n = n->parent) {
    n->lock_ref--;
    if (n->lock_ref == 0) {
      t->protected_tokens -= n->tokens.size();
      t->evictable_tokens += n->tokens.size();
    }
  }
}

// evict up to num_pages pages from unlocked LRU leaves; freed page ids are
// staged; returns count staged. Caller drains with radix_tree_take_freed.
int64_t radix_tree_evict(void* h, int64_t num_pages) {
  Tree* t = static_cast<Tree*>(h);
  t->freed.clear();
  using Entry = std::pair<uint64_t, Node*>;
  auto cmp = [](const Entry& a, const Entry& b) { return a.first > b.first; };
  std::priority_queue<Entry, std::vector<Entry>, decltype(cmp)> heap(cmp);

  // collect unlocked leaves
  std::vector<Node*> stack{&t->root};
  while (!stack.empty()) {
    Node* n = stack.back();
    stack.pop_back();
    for (auto& kv : n->children) stack.push_back(kv.second.get());
    if (n != &t->root && n->children.empty() && n->lock_ref == 0) {
      heap.push({n->last_access, n});
    }
  }
  int64_t evicted = 0;
  while (!heap.empty() && evicted < num_pages) {
    Node* leaf = heap.top().second;
    heap.pop();
    for (Page p : leaf->pages) t->freed.push_back(p);
    evicted += leaf->pages.size();
    t->evictable_tokens -= leaf->tokens.size();
    Node* parent = leaf->parent;
    auto key = edge_key(t, leaf->tokens.data(), leaf->tokens.size());
    parent->children.erase(key);
    if (parent != &t->root && parent->children.empty() &&
        parent->lock_ref == 0) {
      heap.push({parent->last_access, parent});
    }
  }
  return (int64_t)t->freed.size();
}

int64_t radix_tree_take_freed(void* h, Page* out, int64_t max_out) {
  Tree* t = static_cast<Tree*>(h);
  int64_t k = (int64_t)t->freed.size() < max_out ? t->freed.size() : max_out;
  std::memcpy(out, t->freed.data(), k * sizeof(Page));
  t->freed.clear();
  return k;
}

}  // extern "C"
