// Host-side learnable tree filter: MST + rooting + two-pass filtering and
// the full analytic backward, batched with one thread per image.
//
// Why this exists: the tree phase is pointer-chasing (union-find, BFS,
// parent-indexed scans). TPUs have no hardware gather — measured ~27ns per
// gathered row regardless of width — so the O(V log V) fully-vectorized
// on-device formulation (ops/tree_filter.py) is memory-system-bound there.
// The production path therefore runs the graph phase on the host CPU (where
// pointer chasing is ~1ns/node) in ONE batched callback per tree level per
// step. The reference does the same split per-MST-call with a GPU round
// trip each time (mst.cu:93-114); we batch it and also keep the backward
// host-side so no residuals ship.
//
// Semantics identical to ops/tree_filter.py (verified by shared tests):
// - MST over the 4-connected grid, weights ||d embed||^2 + 1, ties by edge
//   index; rooted at vertex 0.
// - edge weight to parent w = exp(-dist / sigma) (low tree) or exp(-dist)
//   (high tree), w_root = 0.
// - upward  A[v] = x[v] + sum_children w_c A[c]
//   downward F[v] = A[v](1 - w_v^2) + w_v F[parent]
//   y = F_x / F_1   (ones channel appended internally)
// - backward: dL/dx = F_{g/z}; edge-weight gradient via the crossing-pair
//   decomposition (same maths as refine.cu:302-370), chained through
//   w = exp(-dist(/sigma)) into d embed (high trees only).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run B independent jobs on at most min(B, cores) threads (override with
// FEDICRA_TREE_THREADS). One-thread-per-image oversubscribes small hosts:
// on the 1-core dev box 12 concurrent images thrash the cache (~20% slower
// than sequential, measured); production hosts (~100 cores) still get one
// image per core.
template <class F>
void run_batch(int B, F&& job) {
  int hw = (int)std::thread::hardware_concurrency();
  if (const char* env = std::getenv("FEDICRA_TREE_THREADS")) {
    int v = std::atoi(env);
    if (v > 0) hw = v;
  }
  int n = hw < 1 ? 1 : (hw < B ? hw : B);
  if (n <= 1) {
    for (int b = 0; b < B; ++b) job(b);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> ts;
  ts.reserve(n);
  for (int t = 0; t < n; ++t)
    ts.emplace_back([&]() {
      for (int b; (b = next.fetch_add(1)) < B;) job(b);
    });
  for (auto& th : ts) th.join();
}

struct DSU2 {
  std::vector<int> parent;
  explicit DSU2(int n) : parent(n) {
    for (int i = 0; i < n; ++i) parent[i] = i;
  }
  int find(int x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
};

// Boruvka MST with (weight, index) total order; fills sel[E].
void mst_select(const int* eu, const int* ev, const float* w, int E, int V,
                std::vector<uint8_t>& sel) {
  DSU2 dsu(V);
  std::vector<int> best(V);
  sel.assign(E, 0);
  int remaining = V - 1;
  while (remaining > 0) {
    for (int v = 0; v < V; ++v) best[v] = -1;
    bool any = false;
    for (int i = 0; i < E; ++i) {
      int cu = dsu.find(eu[i]);
      int cv = dsu.find(ev[i]);
      if (cu == cv) continue;
      any = true;
      for (int c : {cu, cv}) {
        int b = best[c];
        if (b < 0 || w[i] < w[b] || (w[i] == w[b] && i < b)) best[c] = i;
      }
    }
    if (!any) break;
    for (int v = 0; v < V; ++v) {
      int i = best[v];
      if (i < 0 || dsu.find(v) != v) continue;
      int ru = dsu.find(eu[i]), rv = dsu.find(ev[i]);
      if (ru != rv) {
        dsu.parent[ru] = rv;
        if (!sel[i]) {
          sel[i] = 1;
          --remaining;
        }
      }
    }
  }
}

struct Tree {
  std::vector<int> parent;  // parent vertex (root: self)
  std::vector<int> order;   // BFS order from root 0
  // parent position in BFS order: ppos[qi] = index of parent(order[qi]) in
  // `order` (< qi; root maps to 0). All scan state lives in BFS-relabeled
  // arrays so the dependency passes stream memory sequentially — the same
  // layout trick as the reference's sorted_index/sorted_parent
  // (bfs.cu:46-98) — instead of pointer-chasing the vertex space.
  std::vector<int> ppos;
};

void finish_tree(Tree& t, int V) {
  std::vector<int> pos((size_t)V);
  for (int qi = 0; qi < V; ++qi) pos[t.order[qi]] = qi;
  t.ppos.resize((size_t)V);
  for (int qi = 0; qi < V; ++qi) t.ppos[qi] = pos[t.parent[t.order[qi]]];
}

void root_tree(const int* eu, const int* ev, const std::vector<uint8_t>& sel,
               int E, int V, Tree& t) {
  std::vector<int> head(V, -1), nxt, to;
  nxt.reserve(2 * (V - 1));
  to.reserve(2 * (V - 1));
  for (int i = 0; i < E; ++i) {
    if (!sel[i]) continue;
    to.push_back(ev[i]); nxt.push_back(head[eu[i]]); head[eu[i]] = (int)to.size() - 1;
    to.push_back(eu[i]); nxt.push_back(head[ev[i]]); head[ev[i]] = (int)to.size() - 1;
  }
  t.parent.assign(V, -1);
  t.order.clear();
  t.order.reserve(V);
  t.parent[0] = 0;
  t.order.push_back(0);
  for (size_t qi = 0; qi < t.order.size(); ++qi) {
    int u = t.order[qi];
    for (int e = head[u]; e >= 0; e = nxt[e]) {
      int v = to[e];
      if (t.parent[v] < 0) {
        t.parent[v] = u;
        t.order.push_back(v);
      }
    }
  }
  finish_tree(t, V);
}

// upward + downward passes over CH channels, all arrays in BFS order
// (in/out row-major [V, CH] indexed by BFS position, weights w_ord[qi]).
// Reads stream sequentially; the only irregular accesses are the
// parent-position rows, which BFS order keeps close in memory.
// Templated on the channel count so the compiler emits fixed-width vector
// code for the hot row kernels (CH is 3/4/6/8 for C in {2,3}; a runtime
// trip count defeats unrolling on these 12-24 byte rows).
template <int CHT>
void two_pass_ord_t(const std::vector<float>& in_ord,
                    const std::vector<float>& w_ord, const Tree& t, int V,
                    std::vector<float>& A, std::vector<float>& F) {
  A = in_ord;
  const int* __restrict ppos = t.ppos.data();
  const float* __restrict w = w_ord.data();
  float* __restrict Ad = A.data();
  for (int qi = V - 1; qi >= 1; --qi) {
    float wv = w[qi];
    const float* av = Ad + (size_t)qi * CHT;
    float* ap = Ad + (size_t)ppos[qi] * CHT;
    for (int c = 0; c < CHT; ++c) ap[c] += wv * av[c];
  }
  F.resize((size_t)V * CHT);
  float* __restrict Fd = F.data();
  for (int c = 0; c < CHT; ++c) Fd[c] = Ad[c];  // root: w=0
  for (int qi = 1; qi < V; ++qi) {
    float wv = w[qi];
    const float* av = Ad + (size_t)qi * CHT;
    const float* fp = Fd + (size_t)ppos[qi] * CHT;
    float* fv = Fd + (size_t)qi * CHT;
    float k = 1.f - wv * wv;
    for (int c = 0; c < CHT; ++c) fv[c] = av[c] * k + wv * fp[c];
  }
}

void two_pass_ord_generic(const std::vector<float>& in_ord,
                          const std::vector<float>& w_ord, const Tree& t,
                          int V, int CH, std::vector<float>& A,
                          std::vector<float>& F) {
  A = in_ord;
  const int* ppos = t.ppos.data();
  for (int qi = V - 1; qi >= 1; --qi) {
    float wv = w_ord[qi];
    const float* av = &A[(size_t)qi * CH];
    float* ap = &A[(size_t)ppos[qi] * CH];
    for (int c = 0; c < CH; ++c) ap[c] += wv * av[c];
  }
  F.resize((size_t)V * CH);
  for (int c = 0; c < CH; ++c) F[c] = A[c];  // root: w=0
  for (int qi = 1; qi < V; ++qi) {
    float wv = w_ord[qi];
    const float* av = &A[(size_t)qi * CH];
    const float* fp = &F[(size_t)ppos[qi] * CH];
    float* fv = &F[(size_t)qi * CH];
    float k = 1.f - wv * wv;
    for (int c = 0; c < CH; ++c) fv[c] = av[c] * k + wv * fp[c];
  }
}

void two_pass_ord(const std::vector<float>& in_ord,
                  const std::vector<float>& w_ord, const Tree& t, int V,
                  int CH, std::vector<float>& A, std::vector<float>& F) {
  switch (CH) {
    case 3: return two_pass_ord_t<3>(in_ord, w_ord, t, V, A, F);
    case 4: return two_pass_ord_t<4>(in_ord, w_ord, t, V, A, F);
    case 6: return two_pass_ord_t<6>(in_ord, w_ord, t, V, A, F);
    case 8: return two_pass_ord_t<8>(in_ord, w_ord, t, V, A, F);
    default:
      return two_pass_ord_generic(in_ord, w_ord, t, V, CH, A, F);
  }
}

void filter_one(const float* embed, const float* x, const float* gout,
                float* y, float* dx, float* dembed, const int* eu,
                const int* ev, int E, int V, int D, int C, float sigma,
                int low_tree) {
  // MST weights from embed
  std::vector<float> mw((size_t)E);
  for (int i = 0; i < E; ++i) {
    const float* a = embed + (size_t)eu[i] * D;
    const float* b = embed + (size_t)ev[i] * D;
    float s = 0.f;
    for (int d = 0; d < D; ++d) {
      float df = a[d] - b[d];
      s += df * df;
    }
    mw[i] = s + 1.f;
  }
  std::vector<uint8_t> sel;
  mst_select(eu, ev, mw.data(), E, V, sel);
  Tree t;
  root_tree(eu, ev, sel, E, V, t);

  const float inv_sigma = low_tree ? (1.f / sigma) : 1.f;
  std::vector<float> w_ord((size_t)V, 0.f);
  for (int qi = 1; qi < V; ++qi) {
    int v = t.order[qi];
    int p = t.parent[v];
    const float* a = embed + (size_t)v * D;
    const float* b = embed + (size_t)p * D;
    float s = 0.f;
    for (int d = 0; d < D; ++d) {
      float df = a[d] - b[d];
      s += df * df;
    }
    w_ord[qi] = std::exp(-s * inv_sigma);
  }

  // forward on [x, 1], BFS-relabeled
  const int CH = C + 1;
  std::vector<float> xin((size_t)V * CH);
  for (int qi = 0; qi < V; ++qi) {
    const float* xv = x + (size_t)t.order[qi] * C;
    for (int c = 0; c < C; ++c) xin[(size_t)qi * CH + c] = xv[c];
    xin[(size_t)qi * CH + C] = 1.f;
  }
  std::vector<float> A, F;
  two_pass_ord(xin, w_ord, t, V, CH, A, F);
  for (int qi = 0; qi < V; ++qi) {
    float z = F[(size_t)qi * CH + C];
    float* yv = y + (size_t)t.order[qi] * C;
    for (int c = 0; c < C; ++c) yv[c] = F[(size_t)qi * CH + c] / z;
  }
  if (!gout) return;

  // backward: a = g/z, tsig = g*y/z  -> A/F over 2C channels
  const int CH2 = 2 * C;
  std::vector<float> at((size_t)V * CH2);
  for (int qi = 0; qi < V; ++qi) {
    int v = t.order[qi];
    float z = F[(size_t)qi * CH + C];
    const float* gv = gout + (size_t)v * C;
    const float* yv = y + (size_t)v * C;
    for (int c = 0; c < C; ++c) {
      at[(size_t)qi * CH2 + c] = gv[c] / z;
      at[(size_t)qi * CH2 + C + c] = gv[c] * yv[c] / z;
    }
  }
  std::vector<float> Aat, Fat;
  two_pass_ord(at, w_ord, t, V, CH2, Aat, Fat);
  for (int qi = 0; qi < V; ++qi) {
    float* dxv = dx + (size_t)t.order[qi] * C;
    for (int c = 0; c < C; ++c) dxv[c] = Fat[(size_t)qi * CH2 + c];
  }

  if (low_tree || !dembed) return;

  std::memset(dembed, 0, sizeof(float) * (size_t)V * D);
  for (int qi = 1; qi < V; ++qi) {
    int v = t.order[qi];
    int p = t.parent[v];
    int pq = t.ppos[qi];
    float wv = w_ord[qi];
    float s1 = 0.f, s2 = 0.f;
    const float* Av = &A[(size_t)qi * CH];
    const float* Fp = &F[(size_t)pq * CH];
    const float* Aav = &Aat[(size_t)qi * CH2];
    const float* Fap = &Fat[(size_t)pq * CH2];
    for (int c = 0; c < C; ++c) {
      float A_x = Av[c], F_xp = Fp[c];
      float A_a = Aav[c], F_ap = Fap[c];
      float A_t = Aav[C + c], F_tp = Fap[C + c];
      s1 += A_a * (F_xp - wv * A_x) + A_x * (F_ap - wv * A_a);
      s2 += A_t * (Fp[C] - wv * Av[C]) + Av[C] * (F_tp - wv * A_t);
    }
    float dw = s1 - s2;
    // w = exp(-dist * inv_sigma): dL/ddist = dw * (-inv_sigma * w)
    float dd = dw * (-inv_sigma * wv);
    const float* a = embed + (size_t)v * D;
    const float* b = embed + (size_t)p * D;
    float* da = dembed + (size_t)v * D;
    float* db = dembed + (size_t)p * D;
    for (int d = 0; d < D; ++d) {
      float g2 = dd * 2.f * (a[d] - b[d]);
      da[d] += g2;
      db[d] -= g2;
    }
  }
}

}  // namespace

extern "C" {

// embed [B,V,D]; x [B,V,C]; gout NULL or [B,V,C];
// y [B,V,C]; dx [B,V,C] (used when gout); dembed [B,V,D] (when gout &&
// !low_tree); one thread per batch element.
void tree_filter_host_batch(const float* embed, const float* x,
                            const float* gout, float* y, float* dx,
                            float* dembed, const int* eu, const int* ev,
                            int E, int B, int V, int D, int C, float sigma,
                            int low_tree) {
  run_batch(B, [=](int b) {
    filter_one(embed + (size_t)b * V * D, x + (size_t)b * V * C,
               gout ? gout + (size_t)b * V * C : nullptr,
               y + (size_t)b * V * C, dx ? dx + (size_t)b * V * C : nullptr,
               dembed ? dembed + (size_t)b * V * D : nullptr, eu, ev, E, V,
               D, C, sigma, low_tree);
  });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Single-call recursive tree-energy chain (forward + backward), per image:
// builds each level's MST ONCE (Kruskal over pre-sorted edges), keeps the
// two-pass residuals, and runs the analytic backward chain in place. This
// halves the MST work of composing tree_filter_host_batch calls and matters
// on small-core hosts.
// ---------------------------------------------------------------------------

#include <algorithm>
#include <numeric>

namespace {

struct LevelState {
  Tree t;
  std::vector<float> w;      // edge weight to parent, BFS-ordered: w[qi]
  std::vector<float> A, F;   // residuals over C+1 channels, BFS-ordered
};

// Kruskal over an LSD radix sort (2 x 16-bit passes on the order-preserving
// uint32 transform of the positive float weights; 256KB count array stays
// L2-resident). Ties break by edge index automatically: the radix passes
// are stable and process edges in index order. The union uses size so
// near-tied weight fields (smooth features -> index-ordered merges) cannot
// degenerate the find chains; selection depends only on cycle detection,
// which union-by-size leaves identical.
void mst_kruskal(const int* eu, const int* ev, const float* w, int E, int V,
                 std::vector<uint8_t>& sel) {
  std::vector<uint32_t> keys((size_t)E);
  for (int i = 0; i < E; ++i) {
    uint32_t u;
    std::memcpy(&u, &w[i], 4);
    // weights are >= 1 here (||d||^2 + 1) so sign bit is 0: flip it to get
    // an unsigned order-preserving key for all non-negative floats
    keys[i] = u ^ 0x80000000u;
  }
  std::vector<int> order((size_t)E), order2((size_t)E);
  std::iota(order.begin(), order.end(), 0);
  constexpr int RB = 16;
  constexpr int BUCKETS = 1 << RB;
  std::vector<int> count(BUCKETS);
  for (int shift = 0; shift < 32; shift += RB) {
    std::fill(count.begin(), count.end(), 0);
    for (int oi = 0; oi < E; ++oi)
      ++count[(keys[order[oi]] >> shift) & (BUCKETS - 1)];
    int acc = 0;
    for (int b2 = 0; b2 < BUCKETS; ++b2) {
      int c = count[b2];
      count[b2] = acc;
      acc += c;
    }
    for (int oi = 0; oi < E; ++oi) {
      int i = order[oi];
      order2[count[(keys[i] >> shift) & (BUCKETS - 1)]++] = i;
    }
    order.swap(order2);
  }
  DSU2 dsu(V);
  std::vector<int> sz((size_t)V, 1);
  sel.assign(E, 0);
  int remaining = V - 1;
  for (int oi = 0; oi < E && remaining > 0; ++oi) {
    int i = order[oi];
    int ru = dsu.find(eu[i]), rv = dsu.find(ev[i]);
    if (ru == rv) continue;
    if (sz[ru] > sz[rv]) std::swap(ru, rv);
    dsu.parent[ru] = rv;
    sz[rv] += sz[ru];
    sel[i] = 1;
    --remaining;
  }
}

void build_level(const float* embed, int D, const int* eu, const int* ev,
                 int E, int V, float inv_sigma, LevelState& L) {
  std::vector<float> mw((size_t)E);
  for (int i = 0; i < E; ++i) {
    const float* a = embed + (size_t)eu[i] * D;
    const float* b = embed + (size_t)ev[i] * D;
    float s = 0.f;
    for (int d = 0; d < D; ++d) {
      float df = a[d] - b[d];
      s += df * df;
    }
    mw[i] = s + 1.f;
  }
  std::vector<uint8_t> sel;
  mst_kruskal(eu, ev, mw.data(), E, V, sel);
  root_tree(eu, ev, sel, E, V, L.t);
  L.w.assign((size_t)V, 0.f);
  for (int qi = 1; qi < V; ++qi) {
    int v = L.t.order[qi];
    int p = L.t.parent[v];
    const float* a = embed + (size_t)v * D;
    const float* b = embed + (size_t)p * D;
    float s = 0.f;
    for (int d = 0; d < D; ++d) {
      float df = a[d] - b[d];
      s += df * df;
    }
    L.w[qi] = std::exp(-s * inv_sigma);
  }
}

// forward filter of x (C channels + appended ones, vertex order) through
// level L; y returned in vertex order (it feeds the next level, which
// gathers by its own BFS order)
void level_forward(LevelState& L, const float* x, int V, int C,
                   std::vector<float>& y) {
  const int CH = C + 1;
  const int* ord = L.t.order.data();
  std::vector<float> xin((size_t)V * CH);
  for (int qi = 0; qi < V; ++qi) {
    const float* xv = x + (size_t)ord[qi] * C;
    for (int c = 0; c < C; ++c) xin[(size_t)qi * CH + c] = xv[c];
    xin[(size_t)qi * CH + C] = 1.f;
  }
  two_pass_ord(xin, L.w, L.t, V, CH, L.A, L.F);
  y.resize((size_t)V * C);
  for (int qi = 0; qi < V; ++qi) {
    float z = L.F[(size_t)qi * CH + C];
    float* yv = y.data() + (size_t)ord[qi] * C;
    for (int c = 0; c < C; ++c) yv[c] = L.F[(size_t)qi * CH + c] / z;
  }
}

// backward through level L: g (dL/dy, vertex order) -> dx (vertex order);
// accumulate dembed (if embed)
void level_backward(LevelState& L, const float* x, const float* y,
                    const float* g, const float* embed, int D, int V, int C,
                    float inv_sigma, std::vector<float>& dx, float* dembed) {
  const int CH = C + 1;
  const int CH2 = 2 * C;
  const int* ord = L.t.order.data();
  std::vector<float> at((size_t)V * CH2);
  for (int qi = 0; qi < V; ++qi) {
    int v = ord[qi];
    float z = L.F[(size_t)qi * CH + C];
    const float* gv = g + (size_t)v * C;
    const float* yv = y + (size_t)v * C;
    for (int c = 0; c < C; ++c) {
      at[(size_t)qi * CH2 + c] = gv[c] / z;
      at[(size_t)qi * CH2 + C + c] = gv[c] * yv[c] / z;
    }
  }
  std::vector<float> Aat, Fat;
  two_pass_ord(at, L.w, L.t, V, CH2, Aat, Fat);
  dx.resize((size_t)V * C);
  for (int qi = 0; qi < V; ++qi) {
    float* dxv = dx.data() + (size_t)ord[qi] * C;
    for (int c = 0; c < C; ++c) dxv[c] = Fat[(size_t)qi * CH2 + c];
  }

  if (!dembed) return;
  for (int qi = 1; qi < V; ++qi) {
    int v = ord[qi];
    int p = L.t.parent[v];
    int pq = L.t.ppos[qi];
    float wv = L.w[qi];
    float s1 = 0.f, s2 = 0.f;
    const float* Av = &L.A[(size_t)qi * CH];
    const float* Fp = &L.F[(size_t)pq * CH];
    const float* Aav = &Aat[(size_t)qi * CH2];
    const float* Fap = &Fat[(size_t)pq * CH2];
    for (int c = 0; c < C; ++c) {
      s1 += Aav[c] * (Fp[c] - wv * Av[c]) + Av[c] * (Fap[c] - wv * Aav[c]);
      s2 += Aav[C + c] * (Fp[C] - wv * Av[C]) +
            Av[C] * (Fap[C + c] - wv * Aav[C + c]);
    }
    float dd = (s1 - s2) * (-inv_sigma * wv);
    const float* a = embed + (size_t)v * D;
    const float* b = embed + (size_t)p * D;
    float* da = dembed + (size_t)v * D;
    float* db = dembed + (size_t)p * D;
    for (int d = 0; d < D; ++d) {
      float g2 = dd * 2.f * (a[d] - b[d]);
      da[d] += g2;
      db[d] -= g2;
    }
  }
}

void chain_one(const float* low, const float* prob, const float* a1,
               const float* a2, const float* a3, const float* roi,
               float scale, float sigma, const int* eu, const int* ev, int E,
               int V, int D, int C, float* loss_out, float* d_prob,
               float* d_a1, float* d_a2, float* d_a3,
               const int* low_parent = nullptr, const int* low_order = nullptr,
               const float* low_w = nullptr, int recursive = 1) {
  const float* auxs[3] = {a1, a2, a3};
  float* d_auxs[3] = {d_a1, d_a2, d_a3};

  LevelState Llow;
  if (low_parent) {
    // precomputed low-level structure (the guide image repeats across
    // epoch-replayed batches — reference quirk #9 — so its MST/rooting is
    // cacheable; see tree_low_structure_build). low_w is BFS-ordered, as
    // tree_low_structure_build stores it.
    Llow.t.parent.assign(low_parent, low_parent + V);
    Llow.t.order.assign(low_order, low_order + V);
    finish_tree(Llow.t, V);
    Llow.w.assign(low_w, low_w + V);
  } else {
    build_level(low, D, eu, ev, E, V, 1.f / sigma, Llow);
  }
  std::vector<float> AS;
  level_forward(Llow, prob, V, C, AS);

  // Recursive ('Ours', flower_common.py:756-818): AS -> F_h1 -> F_h2 -> F_h3,
  // loss on the final output only. Additive (MScaleAdd, :692-753): each high
  // tree filters AS independently; the three ROI-L1 losses are summed.
  LevelState Lh[3];
  std::vector<float> chain[4];
  chain[0] = AS;
  for (int k = 0; k < 3; ++k) {
    build_level(auxs[k], C, eu, ev, E, V, 1.f, Lh[k]);
    const float* src = recursive ? chain[k].data() : AS.data();
    level_forward(Lh[k], src, V, C, chain[k + 1]);
  }

  float loss = 0.f;
  std::vector<float> g((size_t)V * C, 0.f);       // recursive: d/dAS3
  std::vector<float> gk[3];                       // additive: d/dAS_k
  std::fill(d_prob, d_prob + (size_t)V * C, 0.f);
  for (int k0 = (recursive ? 3 : 1); k0 <= 3; ++k0) {
    const std::vector<float>& ASk = chain[k0];
    std::vector<float>* gt = recursive ? &g : &gk[k0 - 1];
    if (!recursive) gt->assign((size_t)V * C, 0.f);
    for (int v = 0; v < V; ++v) {
      float r = roi[v];
      for (int c = 0; c < C; ++c) {
        float diff = prob[(size_t)v * C + c] - ASk[(size_t)v * C + c];
        loss += r * std::fabs(diff);
        float sg = (diff > 0.f) - (diff < 0.f);
        d_prob[(size_t)v * C + c] += scale * r * sg;  // direct term
        (*gt)[(size_t)v * C + c] = -scale * r * sg;   // d/dAS_k
      }
    }
  }
  *loss_out = scale * loss;

  std::vector<float> g_AS;
  if (recursive) {
    // backward chain through the high levels
    for (int k = 2; k >= 0; --k) {
      std::vector<float> dx;
      level_backward(Lh[k], chain[k].data(), chain[k + 1].data(), g.data(),
                     auxs[k], C, V, C, 1.f, dx, d_auxs[k]);
      g.swap(dx);
    }
    g_AS.swap(g);
  } else {
    // fan-out: each level backpropagates its own cotangent to AS; sum
    g_AS.assign((size_t)V * C, 0.f);
    for (int k = 0; k < 3; ++k) {
      std::vector<float> dx;
      level_backward(Lh[k], AS.data(), chain[k + 1].data(), gk[k].data(),
                     auxs[k], C, V, C, 1.f, dx, d_auxs[k]);
      for (size_t i = 0; i < (size_t)V * C; ++i) g_AS[i] += dx[i];
    }
  }
  // low level: gradient to prob only
  std::vector<float> dxp;
  level_backward(Llow, prob, AS.data(), g_AS.data(), nullptr, D, V, C,
                 1.f / sigma, dxp, nullptr);
  for (size_t i = 0; i < (size_t)V * C; ++i) d_prob[i] += dxp[i];
}

}  // namespace

extern "C" {

// Full multi-scale tree-energy chain, batched. scale = weight / max(N,1)
// precomputed by the caller over the whole batch. Outputs are zero-filled
// by the caller. loss_out: [B] per-image (sum host-side). recursive=1:
// 'Ours' chained variant; 0: MScaleAdd fan-out variant.
void tree_energy_chain_host(const float* low, const float* prob,
                            const float* a1, const float* a2, const float* a3,
                            const float* roi, float scale, float sigma,
                            const int* eu, const int* ev, int E, int B, int V,
                            int D, int C, float* loss_out, float* d_prob,
                            float* d_a1, float* d_a2, float* d_a3,
                            int recursive) {
  run_batch(B, [=](int b) {
    size_t oc = (size_t)b * V * C;
    size_t od = (size_t)b * V * D;
    size_t ov = (size_t)b * V;
    chain_one(low + od, prob + oc, a1 + oc, a2 + oc, a3 + oc, roi + ov,
              scale, sigma, eu, ev, E, V, D, C, loss_out + b, d_prob + oc,
              d_a1 + oc, d_a2 + oc, d_a3 + oc, nullptr, nullptr, nullptr,
              recursive);
  });
}

// Precompute the low level's tree structure for a batch of guide images:
// parent_out/order_out int32 [B,V], w_out float [B,V]. The caller caches
// these per epoch-replayed batch and feeds tree_energy_chain_host_cached.
void tree_low_structure_build(const float* low, const int* eu, const int* ev,
                              int E, int B, int V, int D, float sigma,
                              int* parent_out, int* order_out, float* w_out) {
  run_batch(B, [=](int b) {
    LevelState L;
    build_level(low + (size_t)b * V * D, D, eu, ev, E, V, 1.f / sigma, L);
    std::memcpy(parent_out + (size_t)b * V, L.t.parent.data(),
                sizeof(int) * V);
    std::memcpy(order_out + (size_t)b * V, L.t.order.data(),
                sizeof(int) * V);
    std::memcpy(w_out + (size_t)b * V, L.w.data(), sizeof(float) * V);
  });
}

// Chain with a precomputed low-level structure ([B,V] arrays; pass NULLs to
// rebuild internally, equivalent to tree_energy_chain_host).
void tree_energy_chain_host_cached(
    const float* low, const float* prob, const float* a1, const float* a2,
    const float* a3, const float* roi, float scale, float sigma, const int* eu,
    const int* ev, int E, int B, int V, int D, int C, float* loss_out,
    float* d_prob, float* d_a1, float* d_a2, float* d_a3,
    const int* low_parent, const int* low_order, const float* low_w,
    int recursive) {
  run_batch(B, [=](int b) {
    size_t oc = (size_t)b * V * C;
    size_t od = (size_t)b * V * D;
    size_t ov = (size_t)b * V;
    chain_one(low + od, prob + oc, a1 + oc, a2 + oc, a3 + oc, roi + ov,
              scale, sigma, eu, ev, E, V, D, C, loss_out + b, d_prob + oc,
              d_a1 + oc, d_a2 + oc, d_a3 + oc,
              low_parent ? low_parent + ov : nullptr,
              low_order ? low_order + ov : nullptr,
              low_w ? low_w + ov : nullptr, recursive);
  });
}

// Packed-layout chain: the split trainer ships ONE (B,V,4C) array per chunk
// (probs then aux1..3 along the channel axis, bf16 or f32) and wants the
// four cotangents back in the same packed layout. Channel-slicing that
// array host-side in numpy costs ~2 s/iteration of strided copies at the
// headline config (measured, round 4); here each image's worker thread
// deinterleaves with streaming reads (bf16 widening to f32 is exact, so
// this equals numpy's astype bit-for-bit), runs the identical chain_one,
// and re-interleaves the cotangents. packed_is_bf16: packed rows are
// uint16 bfloat16 bit patterns; d_packed is always f32 (the caller owns
// the lossy f32->bf16 rounding for the upload).
void tree_energy_chain_host_packed(
    const float* low, const void* packed, const float* roi, float scale,
    float sigma, const int* eu, const int* ev, int E, int B, int V, int D,
    int C, int packed_is_bf16, float* loss_out, float* d_packed,
    const int* low_parent, const int* low_order, const float* low_w,
    int recursive) {
  const int P = 4 * C;
  run_batch(B, [=](int b) {
    size_t ov = (size_t)b * V;
    size_t op = ov * P;
    std::vector<float> prob((size_t)V * C), a1((size_t)V * C),
        a2((size_t)V * C), a3((size_t)V * C);
    float* outs[4] = {prob.data(), a1.data(), a2.data(), a3.data()};
    if (packed_is_bf16) {
      const uint16_t* src = (const uint16_t*)packed + op;
      for (int v = 0; v < V; ++v) {
        const uint16_t* r = src + (size_t)v * P;
        for (int k = 0; k < 4; ++k)
          for (int c = 0; c < C; ++c) {
            uint32_t u = (uint32_t)r[k * C + c] << 16;
            float f;
            std::memcpy(&f, &u, 4);
            outs[k][(size_t)v * C + c] = f;
          }
      }
    } else {
      const float* src = (const float*)packed + op;
      for (int v = 0; v < V; ++v) {
        const float* r = src + (size_t)v * P;
        for (int k = 0; k < 4; ++k)
          for (int c = 0; c < C; ++c) outs[k][(size_t)v * C + c] = r[k * C + c];
      }
    }
    std::vector<float> dp((size_t)V * C, 0.f), d1((size_t)V * C, 0.f),
        d2((size_t)V * C, 0.f), d3((size_t)V * C, 0.f);
    chain_one(low + ov * D, prob.data(), a1.data(), a2.data(), a3.data(),
              roi + ov, scale, sigma, eu, ev, E, V, D, C, loss_out + b,
              dp.data(), d1.data(), d2.data(), d3.data(),
              low_parent ? low_parent + ov : nullptr,
              low_order ? low_order + ov : nullptr,
              low_w ? low_w + ov : nullptr, recursive);
    const float* ds[4] = {dp.data(), d1.data(), d2.data(), d3.data()};
    float* dst = d_packed + op;
    for (int v = 0; v < V; ++v) {
      float* r = dst + (size_t)v * P;
      for (int k = 0; k < 4; ++k)
        for (int c = 0; c < C; ++c) r[k * C + c] = ds[k][(size_t)v * C + c];
    }
  });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native-resolution packed chain: the split trainer's low-bandwidth wire
// format. The device ships ONE flat (B, L) array per chunk with the four
// blocks [prob(H,W,C) | aux1(h1,w1,C) | aux2 | aux3] each flattened at its
// own (decoder-native) resolution; the aux blocks are bilinearly upsampled
// to (H,W) HERE — exactly jax.image.resize 'linear' (half-pixel centers,
// edge clamp; taps replicate losses/tree_energy_host.linear_resize_matrix's
// float accumulation) — and the aux cotangents are pulled back through the
// resize ADJOINT and re-packed in the same layout, so the device injects
// them at native resolution (equivalent by linearity). This cuts the
// device<->host bytes ~42% at the headline config vs full-res shipping,
// for a few ms of 4-tap arithmetic per image.
// ---------------------------------------------------------------------------

namespace {

struct LinearTaps {
  std::vector<int> a, b;
  std::vector<float> wa, wb;
};

// jax.image.resize method='linear' sampling: out[i] reads in[a] * (1-f) +
// in[b] * f at pos = (i+0.5)*n_in/n_out - 0.5 with edge clamp; when the
// clamp makes a == b the taps merge ((1-f)+f in float, matching the
// matrix-path accumulation order bit-for-bit).
LinearTaps make_linear_taps(int n_out, int n_in) {
  LinearTaps t;
  t.a.resize(n_out);
  t.b.resize(n_out);
  t.wa.resize(n_out);
  t.wb.resize(n_out);
  double scale = (double)n_in / (double)n_out;
  for (int i = 0; i < n_out; ++i) {
    double pos = ((double)i + 0.5) * scale - 0.5;
    int j0 = (int)std::floor(pos);
    double f = pos - (double)j0;
    int a = j0 < 0 ? 0 : (j0 > n_in - 1 ? n_in - 1 : j0);
    int b = j0 + 1 < 0 ? 0 : (j0 + 1 > n_in - 1 ? n_in - 1 : j0 + 1);
    if (a == b) {
      t.a[i] = a;
      t.b[i] = a;
      t.wa[i] = (float)(1.0 - f) + (float)f;
      t.wb[i] = 0.0f;
    } else {
      t.a[i] = a;
      t.b[i] = b;
      t.wa[i] = (float)(1.0 - f);
      t.wb[i] = (float)f;
    }
  }
  return t;
}

// (h,w,C) -> (H,W,C), rows then columns (the numpy reference path's order).
// tmp must hold H*w*C floats.
void resize_up_one(const float* src, int h, int w, float* dst, int H, int W,
                   int C, float* tmp) {
  LinearTaps th = make_linear_taps(H, h), tw = make_linear_taps(W, w);
  const size_t wc = (size_t)w * C;
  for (int i = 0; i < H; ++i) {
    const float* ra = src + (size_t)th.a[i] * wc;
    const float* rb = src + (size_t)th.b[i] * wc;
    float wa = th.wa[i], wb = th.wb[i];
    float* out = tmp + (size_t)i * wc;
    for (size_t k = 0; k < wc; ++k) out[k] = wa * ra[k] + wb * rb[k];
  }
  for (int i = 0; i < H; ++i) {
    const float* row = tmp + (size_t)i * wc;
    float* out = dst + (size_t)i * W * C;
    for (int j = 0; j < W; ++j) {
      const float* ca = row + (size_t)tw.a[j] * C;
      const float* cb = row + (size_t)tw.b[j] * C;
      float wa = tw.wa[j], wb = tw.wb[j];
      for (int c = 0; c < C; ++c)
        out[(size_t)j * C + c] = wa * ca[c] + wb * cb[c];
    }
  }
}

// Exact adjoint of resize_up_one: (H,W,C) cotangent -> (h,w,C).
// Applies the transposed taps in reverse order (columns^T then rows^T).
// tmp must hold H*w*C floats.
void resize_adjoint_one(const float* d, int H, int W, float* out, int h,
                        int w, int C, float* tmp) {
  LinearTaps th = make_linear_taps(H, h), tw = make_linear_taps(W, w);
  const size_t wc = (size_t)w * C;
  std::fill(tmp, tmp + (size_t)H * wc, 0.f);
  for (int i = 0; i < H; ++i) {
    const float* row = d + (size_t)i * W * C;
    float* trow = tmp + (size_t)i * wc;
    for (int j = 0; j < W; ++j) {
      const float* s = row + (size_t)j * C;
      float wa = tw.wa[j], wb = tw.wb[j];
      float* ta = trow + (size_t)tw.a[j] * C;
      for (int c = 0; c < C; ++c) ta[c] += wa * s[c];
      if (wb != 0.f) {
        float* tb = trow + (size_t)tw.b[j] * C;
        for (int c = 0; c < C; ++c) tb[c] += wb * s[c];
      }
    }
  }
  std::fill(out, out + (size_t)h * wc, 0.f);
  for (int i = 0; i < H; ++i) {
    const float* trow = tmp + (size_t)i * wc;
    float wa = th.wa[i], wb = th.wb[i];
    float* oa = out + (size_t)th.a[i] * wc;
    for (size_t k = 0; k < wc; ++k) oa[k] += wa * trow[k];
    if (wb != 0.f) {
      float* ob = out + (size_t)th.b[i] * wc;
      for (size_t k = 0; k < wc; ++k) ob[k] += wb * trow[k];
    }
  }
}

}  // namespace

extern "C" {

// Standalone batched entry points (tests + the host python fallback).
void resize_up_host_native(const float* src, int B, int h, int w, int C,
                           float* dst, int H, int W) {
  run_batch(B, [=](int b) {
    std::vector<float> tmp((size_t)H * w * C);
    resize_up_one(src + (size_t)b * h * w * C, h, w,
                  dst + (size_t)b * H * W * C, H, W, C, tmp.data());
  });
}

void resize_adjoint_host_native(const float* d, int B, int H, int W, int C,
                                float* out, int h, int w) {
  run_batch(B, [=](int b) {
    std::vector<float> tmp((size_t)H * w * C);
    resize_adjoint_one(d + (size_t)b * H * W * C, H, W,
                       out + (size_t)b * h * w * C, h, w, C, tmp.data());
  });
}

// hws: 8 ints h0,w0,h1,w1,h2,w2,h3,w3 (block 0 = probs at full res; V =
// h0*w0). packed/d_packed: (B, L) with L = sum_k h_k*w_k*C. dtype code in
// packed_is_bf16 (0 = f32, 1 = bf16 bit patterns); d_packed is always f32.
void tree_energy_chain_host_npacked(
    const float* low, const void* packed, const float* roi, float scale,
    float sigma, const int* eu, const int* ev, int E, int B, int D, int C,
    int packed_is_bf16, const int* hws, float* loss_out, float* d_packed,
    const int* low_parent, const int* low_order, const float* low_w,
    int recursive) {
  const int H = hws[0], W = hws[1];
  const int V = H * W;
  size_t lens[4], offs[4];
  size_t L = 0;
  for (int k = 0; k < 4; ++k) {
    lens[k] = (size_t)hws[2 * k] * hws[2 * k + 1] * C;
    offs[k] = L;
    L += lens[k];
  }
  run_batch(B, [=](int b) {
    size_t ov = (size_t)b * V;
    size_t op = (size_t)b * L;
    std::vector<float> nat(L);
    if (packed_is_bf16) {
      const uint16_t* src = (const uint16_t*)packed + op;
      for (size_t i = 0; i < L; ++i) {
        uint32_t u = (uint32_t)src[i] << 16;
        std::memcpy(&nat[i], &u, 4);
      }
    } else {
      std::memcpy(nat.data(), (const float*)packed + op, L * sizeof(float));
    }
    std::vector<float> a_up(3 * (size_t)V * C);
    std::vector<float> tmp;
    const float* aux_ptr[3];
    for (int k = 1; k < 4; ++k) {
      int h = hws[2 * k], w = hws[2 * k + 1];
      if (h == H && w == W) {
        aux_ptr[k - 1] = nat.data() + offs[k];
      } else {
        tmp.resize((size_t)H * w * C);
        float* dst = a_up.data() + (size_t)(k - 1) * V * C;
        resize_up_one(nat.data() + offs[k], h, w, dst, H, W, C, tmp.data());
        aux_ptr[k - 1] = dst;
      }
    }
    std::vector<float> dp((size_t)V * C, 0.f), d1((size_t)V * C, 0.f),
        d2((size_t)V * C, 0.f), d3((size_t)V * C, 0.f);
    chain_one(low + ov * D, nat.data() + offs[0], aux_ptr[0], aux_ptr[1],
              aux_ptr[2], roi + ov, scale, sigma, eu, ev, E, V, D, C,
              loss_out + b, dp.data(), d1.data(), d2.data(), d3.data(),
              low_parent ? low_parent + ov : nullptr,
              low_order ? low_order + ov : nullptr,
              low_w ? low_w + ov : nullptr, recursive);
    float* out = d_packed + op;
    std::memcpy(out + offs[0], dp.data(), lens[0] * sizeof(float));
    float* ds[3] = {d1.data(), d2.data(), d3.data()};
    for (int k = 1; k < 4; ++k) {
      int h = hws[2 * k], w = hws[2 * k + 1];
      if (h == H && w == W) {
        std::memcpy(out + offs[k], ds[k - 1], lens[k] * sizeof(float));
      } else {
        tmp.resize((size_t)H * w * C);
        resize_adjoint_one(ds[k - 1], H, W, out + offs[k], h, w, C,
                           tmp.data());
      }
    }
  });
}

}  // extern "C"
