// Host-side batched Boruvka MST (C++), the native counterpart of the
// on-device JAX implementation in fedicra_tpu/ops/mst.py.
//
// Role in this framework: (a) an independent native oracle for testing the
// device MST (the reference computes its MSTs on the host too —
// lib_tree_filter/src/mst/mst.cu launches one CPU thread per batch element);
// (b) a host fallback for environments without an accelerator.
//
// Determinism contract (identical to ops/mst.py): edges are totally ordered
// by (weight, edge_index); ties break toward the smaller index, making the
// MST unique.
//
// Build: g++ -O3 -fPIC -shared -o libfedicra_native.so boruvka.cpp -pthread
// Exposed C ABI (ctypes):
//   void boruvka_mst_batch(const int* eu, const int* ev, const float* ew,
//                          int num_edges, int num_vertices, int batch,
//                          unsigned char* selected_out);
//   (ew and selected_out are [batch, num_edges]; eu/ev shared across batch)

#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct DSU {
  std::vector<int> parent;
  explicit DSU(int n) : parent(n) {
    for (int i = 0; i < n; ++i) parent[i] = i;
  }
  int find(int x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  bool unite(int a, int b) {
    a = find(a);
    b = find(b);
    if (a == b) return false;
    parent[a] = b;
    return true;
  }
};

// lexicographic (weight, index) comparison
inline bool edge_less(float wa, int ia, float wb, int ib) {
  if (wa != wb) return wa < wb;
  return ia < ib;
}

void mst_one(const int* eu, const int* ev, const float* ew, int E, int V,
             unsigned char* sel) {
  DSU dsu(V);
  std::vector<int> comp_of(V);
  std::vector<int> best(V);
  for (int i = 0; i < E; ++i) sel[i] = 0;
  int remaining = V - 1;
  while (remaining > 0) {
    // find the minimum outgoing edge of every component
    for (int v = 0; v < V; ++v) best[v] = -1;
    bool any = false;
    for (int i = 0; i < E; ++i) {
      int cu = dsu.find(eu[i]);
      int cv = dsu.find(ev[i]);
      if (cu == cv) continue;
      any = true;
      for (int c : {cu, cv}) {
        if (best[c] < 0 ||
            edge_less(ew[i], i, ew[best[c]], best[c]))
          best[c] = i;
      }
    }
    if (!any) break;  // disconnected input
    for (int v = 0; v < V; ++v) {
      int i = best[v];
      if (i < 0 || dsu.find(v) != v) continue;
      if (dsu.unite(eu[i], ev[i]) && !sel[i]) {
        sel[i] = 1;
        --remaining;
      }
      // a failed unite is always the twin pick of a mutual pair, which
      // shares the same edge index and has already been selected
    }
  }
}

}  // namespace

extern "C" {

void boruvka_mst_batch(const int* eu, const int* ev, const float* ew,
                       int num_edges, int num_vertices, int batch,
                       unsigned char* selected_out) {
  std::vector<std::thread> threads;
  threads.reserve(batch);
  for (int b = 0; b < batch; ++b) {
    threads.emplace_back(mst_one, eu, ev, ew + (int64_t)b * num_edges,
                         num_edges, num_vertices,
                         selected_out + (int64_t)b * num_edges);
  }
  for (auto& t : threads) t.join();
}

}  // extern "C"
