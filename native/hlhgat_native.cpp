// hlhgat_native: host-side preprocessing kernels for the TPU framework.
//
// The reference offloads these to torch-cluster's C++/CUDA (graclus greedy
// matching, reference lib/Hodge_Dataset.py:252) and pure-Python dict loops
// (coarse-edge dedup, reference lib/Hodge_Dataset.py:260-274; ELL packing has
// no reference analog — it feeds the Pallas SpMM kernel).  These run on the
// host during dataset preprocessing; C++ keeps the offline pipeline fast on
// large complexes (brain FC graphs, TSP instances).
//
// Bit-compatible with the Python fallbacks in hl_hgat_tpu (same visit order,
// same stable tie-breaking) — the test suite asserts equality.
//
// Build: `make -C native` → libhlhgat_native.so, loaded via ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Greedy heavy-edge matching (graclus). Nodes are visited in index order;
// each unmatched node pairs with its heaviest-weight unmatched neighbour
// (ties broken by edge input order, matching a stable descending sort).
// out_cluster[i] receives the representative node id (min of the pair).
void graclus_match(int64_t num_nodes, int64_t num_edges,
                   const int32_t* src, const int32_t* dst,
                   const float* weight, int64_t* out_cluster) {
  // bucket neighbours per node, then order each bucket by descending weight
  std::vector<int64_t> degree(num_nodes, 0);
  for (int64_t i = 0; i < num_edges; ++i) {
    if (src[i] == dst[i]) continue;
    ++degree[src[i]];
    ++degree[dst[i]];
  }
  std::vector<int64_t> offset(num_nodes + 1, 0);
  for (int64_t v = 0; v < num_nodes; ++v) offset[v + 1] = offset[v] + degree[v];
  struct Nbr { int32_t v; float w; int64_t order; };
  std::vector<Nbr> nbrs(offset[num_nodes]);
  std::vector<int64_t> cursor(offset.begin(), offset.end() - 1);
  for (int64_t i = 0; i < num_edges; ++i) {
    const int32_t u = src[i], v = dst[i];
    if (u == v) continue;
    const float w = weight ? weight[i] : 1.0f;
    nbrs[cursor[u]++] = {v, w, i};
    nbrs[cursor[v]++] = {u, w, i};
  }
  for (int64_t v = 0; v < num_nodes; ++v) {
    std::stable_sort(nbrs.begin() + offset[v], nbrs.begin() + offset[v + 1],
                     [](const Nbr& a, const Nbr& b) { return a.w > b.w; });
  }
  std::vector<int64_t> m(num_nodes, -1);
  for (int64_t u = 0; u < num_nodes; ++u) {
    if (m[u] >= 0) continue;
    int64_t best = -1;
    for (int64_t k = offset[u]; k < offset[u + 1]; ++k) {
      const int32_t v = nbrs[k].v;
      if (m[v] < 0 && v != u) { best = v; break; }
    }
    if (best >= 0) {
      const int64_t rep = std::min<int64_t>(u, best);
      m[u] = rep;
      m[best] = rep;
    } else {
      m[u] = u;
    }
  }
  std::memcpy(out_cluster, m.data(), sizeof(int64_t) * num_nodes);
}

// Coarse-edge construction: first-seen dedup of (min,max) cluster pairs.
// c_edge[i] = coarse edge id of fine edge i, or -1 when both endpoints
// collapse into one cluster (the reference's `inf` marker).
// Returns the number of coarse edges; coarse endpoints land in
// out_src/out_dst (caller provides capacity num_edges).
int64_t coarse_edges(int64_t num_edges, const int32_t* src, const int32_t* dst,
                     const int64_t* c_node, int32_t* out_src, int32_t* out_dst,
                     int64_t* c_edge) {
  std::unordered_map<int64_t, int64_t> seen;
  seen.reserve(static_cast<size_t>(num_edges) * 2);
  int64_t next = 0;
  for (int64_t i = 0; i < num_edges; ++i) {
    const int64_t a = c_node[src[i]], b = c_node[dst[i]];
    if (a == b) { c_edge[i] = -1; continue; }
    const int64_t lo = std::min(a, b), hi = std::max(a, b);
    const int64_t key = (lo << 32) | hi;
    auto it = seen.find(key);
    if (it != seen.end()) {
      c_edge[i] = it->second;
    } else {
      seen.emplace(key, next);
      out_src[next] = static_cast<int32_t>(lo);
      out_dst[next] = static_cast<int32_t>(hi);
      c_edge[i] = next;
      ++next;
    }
  }
  return next;
}

// COO -> ELL packing for the Pallas SpMM kernel. Zero-valued (padding)
// entries are skipped. Returns -1 if any row exceeds `width`, else 0.
int32_t coo_to_ell(int64_t nnz, const int32_t* rows, const int32_t* cols,
                   const float* vals, int64_t num_rows, int64_t width,
                   int32_t* ell_cols, float* ell_vals) {
  std::vector<int64_t> cursor(num_rows, 0);
  std::memset(ell_cols, 0, sizeof(int32_t) * num_rows * width);
  std::memset(ell_vals, 0, sizeof(float) * num_rows * width);
  for (int64_t i = 0; i < nnz; ++i) {
    if (vals[i] == 0.0f) continue;
    const int64_t r = rows[i];
    const int64_t k = cursor[r];
    if (k >= width) return -1;
    ell_cols[r * width + k] = cols[i];
    ell_vals[r * width + k] = vals[i];
    cursor[r] = k + 1;
  }
  return 0;
}

// L1 = B1^T B1 construction, coalesced COO output, values pre-scaled.
// For each node, all ordered pairs of incident edges contribute
// sign(e@v) * sign(f@v); sign = -1 at the edge's src, +1 at its dst.
// out_* must have capacity sum(deg^2) (call l1_pair_count first).
// Returns the coalesced nnz.
int64_t hodge_l1(int64_t num_nodes, int64_t num_edges,
                 const int32_t* src, const int32_t* dst, float scale,
                 int32_t* out_rows, int32_t* out_cols, float* out_vals) {
  std::vector<int64_t> degree(num_nodes, 0);
  for (int64_t i = 0; i < num_edges; ++i) { ++degree[src[i]]; ++degree[dst[i]]; }
  std::vector<int64_t> offset(num_nodes + 1, 0);
  for (int64_t v = 0; v < num_nodes; ++v) offset[v + 1] = offset[v] + degree[v];
  std::vector<int32_t> inc_edge(offset[num_nodes]);
  std::vector<int8_t> inc_sign(offset[num_nodes]);
  std::vector<int64_t> cursor(offset.begin(), offset.end() - 1);
  for (int64_t i = 0; i < num_edges; ++i) {
    inc_edge[cursor[src[i]]] = static_cast<int32_t>(i);
    inc_sign[cursor[src[i]]++] = -1;
    inc_edge[cursor[dst[i]]] = static_cast<int32_t>(i);
    inc_sign[cursor[dst[i]]++] = 1;
  }
  struct Ent { int64_t key; float val; };
  std::vector<Ent> ents;
  int64_t cap = 0;
  for (int64_t v = 0; v < num_nodes; ++v) cap += degree[v] * degree[v];
  ents.reserve(cap);
  for (int64_t v = 0; v < num_nodes; ++v) {
    for (int64_t a = offset[v]; a < offset[v + 1]; ++a) {
      for (int64_t b = offset[v]; b < offset[v + 1]; ++b) {
        const int64_t key =
            static_cast<int64_t>(inc_edge[a]) * num_edges + inc_edge[b];
        ents.push_back({key, static_cast<float>(inc_sign[a] * inc_sign[b])});
      }
    }
  }
  std::sort(ents.begin(), ents.end(),
            [](const Ent& x, const Ent& y) { return x.key < y.key; });
  int64_t nnz = 0;
  size_t i = 0;
  while (i < ents.size()) {
    const int64_t key = ents[i].key;
    float sum = 0.0f;
    while (i < ents.size() && ents[i].key == key) sum += ents[i++].val;
    if (sum != 0.0f) {
      out_rows[nnz] = static_cast<int32_t>(key / num_edges);
      out_cols[nnz] = static_cast<int32_t>(key % num_edges);
      out_vals[nnz] = sum * scale;
      ++nnz;
    }
  }
  return nnz;
}

int64_t l1_pair_count(int64_t num_nodes, int64_t num_edges,
                      const int32_t* src, const int32_t* dst) {
  std::vector<int64_t> degree(num_nodes, 0);
  for (int64_t i = 0; i < num_edges; ++i) { ++degree[src[i]]; ++degree[dst[i]]; }
  int64_t total = 0;
  for (int64_t v = 0; v < num_nodes; ++v) total += degree[v] * degree[v];
  return total;
}

// Max nnz per row of a COO pattern (for choosing the ELL width).
int64_t max_row_nnz(int64_t nnz, const int32_t* rows, const float* vals,
                    int64_t num_rows) {
  std::vector<int64_t> count(num_rows, 0);
  for (int64_t i = 0; i < nnz; ++i) {
    if (vals[i] != 0.0f) ++count[rows[i]];
  }
  int64_t mx = 0;
  for (int64_t r = 0; r < num_rows; ++r) mx = std::max(mx, count[r]);
  return mx;
}

}  // extern "C"
