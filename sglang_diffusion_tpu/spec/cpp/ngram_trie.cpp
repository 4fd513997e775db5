// Native n-gram trie for speculative drafting.
//
// Re-design of the reference's C++ ngram helper
// (srt/speculative/cpp_ngram/ngram.cpp): a trie over sliding token windows
// of the recent history. insert() slides an (n+k)-window over new tokens so
// every n-gram key stores up to k continuation branches with hit counts;
// propose() walks the trie with the trailing n-gram and greedily follows
// the highest-count child chain.
//
// Plain C ABI for ctypes binding (no pybind11 in this image); single
// writer per engine thread, no locking needed.

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <vector>

namespace {

struct Node {
  std::map<int32_t, std::unique_ptr<Node>> children;
  int64_t count = 0;  // how many times this path was observed
};

struct NgramTrie {
  explicit NgramTrie(int n, int k, int64_t cap)
      : n(n), k(k), capacity(cap) {}

  int n;          // match-key length
  int k;          // max continuation length stored
  int64_t capacity;  // max stored windows before reset (memory bound)
  int64_t inserted = 0;
  Node root;

  void insert_window(const int32_t* w, int len) {
    Node* cur = &root;
    for (int i = 0; i < len; ++i) {
      auto it = cur->children.find(w[i]);
      if (it == cur->children.end()) {
        it = cur->children.emplace(w[i], std::make_unique<Node>()).first;
      }
      cur = it->second.get();
      cur->count += 1;
    }
  }

  void insert(const int32_t* toks, int len) {
    if (inserted > capacity) {
      root.children.clear();
      inserted = 0;
    }
    const int win = n + k;
    for (int s = 0; s + n <= len; ++s) {
      int w = std::min(win, len - s);
      insert_window(toks + s, w);
      ++inserted;
    }
  }

  // Returns number of proposed tokens written to out (size >= k).
  int propose(const int32_t* key, int key_len, int32_t* out) const {
    const Node* cur = &root;
    for (int i = 0; i < key_len; ++i) {
      auto it = cur->children.find(key[i]);
      if (it == cur->children.end()) return 0;
      cur = it->second.get();
    }
    int m = 0;
    while (m < k) {
      const Node* best = nullptr;
      int32_t best_tok = -1;
      for (const auto& [tok, child] : cur->children) {
        if (!best || child->count > best->count) {
          best = child.get();
          best_tok = tok;
        }
      }
      if (!best) break;
      out[m++] = best_tok;
      cur = best;
    }
    return m;
  }
};

}  // namespace

extern "C" {

void* ngram_trie_create(int n, int k, int64_t capacity) {
  return new NgramTrie(n, k, capacity);
}

void ngram_trie_destroy(void* h) { delete static_cast<NgramTrie*>(h); }

void ngram_trie_insert(void* h, const int32_t* toks, int len) {
  static_cast<NgramTrie*>(h)->insert(toks, len);
}

int ngram_trie_propose(void* h, const int32_t* key, int key_len,
                       int32_t* out) {
  return static_cast<NgramTrie*>(h)->propose(key, key_len, out);
}

int64_t ngram_trie_size(void* h) {
  return static_cast<NgramTrie*>(h)->inserted;
}

}  // extern "C"
