// CPU baseline measurement harness.
//
// A fresh single-threaded C++ implementation of the reference's Vamana
// algorithms with the same algorithmic structure the reference's Cython/C++
// module uses (scalar distance loops, heap-based greedy search, alpha
// RobustPrune, 2-pass sequential build with reverse-edge insertion and
// re-prune on overflow; cf. reference pydiskann/cython_utils.pyx:269-369 —
// behavior reimplemented, no code copied). Compiled -O3 -ffast-math
// single-thread, exactly like the reference's build flags
// (pydiskann/setup.py:10), so the measured numbers anchor the TPU
// framework's speedup ratios (BASELINE.md).
//
// Usage: reference_baseline <data.bin> <n> <dim> <queries.bin> <nq> <R> <L_build> <alpha> <k> <L1,L2,...>
//   data.bin / queries.bin: raw little-endian float32 row-major.
// Output: one JSON line with build seconds + per-L recall/QPS.

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <random>
#include <string>
#include <vector>

using std::size_t;
using clk = std::chrono::steady_clock;

static inline float l2_sq(const float* a, const float* b, int dim) {
  float acc = 0.f;
  for (int i = 0; i < dim; ++i) {
    float d = a[i] - b[i];
    acc += d * d;
  }
  return acc;
}

struct Graph {
  int n = 0, R = 0, dim = 0;
  const float* pts = nullptr;
  std::vector<std::vector<int>> nbrs;
  int medoid = 0;
};

// Greedy search: candidate min-heap + size-L result max-heap, early exit
// when the best candidate is worse than the worst kept result.
static std::vector<std::pair<float, int>> greedy_search(
    const Graph& g, const float* q, int L, std::vector<int>* visited_out) {
  std::priority_queue<std::pair<float, int>, std::vector<std::pair<float, int>>,
                      std::greater<>> cand;
  std::priority_queue<std::pair<float, int>> results;  // max-heap
  std::vector<uint8_t> seen(g.n, 0);

  float d0 = l2_sq(q, g.pts + (size_t)g.medoid * g.dim, g.dim);
  cand.emplace(d0, g.medoid);
  results.emplace(d0, g.medoid);
  seen[g.medoid] = 1;

  while (!cand.empty()) {
    auto [d, u] = cand.top();
    cand.pop();
    if ((int)results.size() >= L && d > results.top().first) break;
    if (visited_out) visited_out->push_back(u);
    for (int v : g.nbrs[u]) {
      if (v < 0 || seen[v]) continue;
      seen[v] = 1;
      float dv = l2_sq(q, g.pts + (size_t)v * g.dim, g.dim);
      if ((int)results.size() < L || dv < results.top().first) {
        cand.emplace(dv, v);
        results.emplace(dv, v);
        if ((int)results.size() > L) results.pop();
      }
    }
  }
  std::vector<std::pair<float, int>> out;
  out.reserve(results.size());
  while (!results.empty()) {
    out.push_back(results.top());
    results.pop();
  }
  std::sort(out.begin(), out.end());
  return out;
}

// alpha RobustPrune over a candidate set (sorted by distance to p).
static void robust_prune(const Graph& g, int p,
                         std::vector<std::pair<float, int>>& cands,
                         float alpha, std::vector<int>& out) {
  std::sort(cands.begin(), cands.end());
  std::vector<uint8_t> removed(cands.size(), 0);
  out.clear();
  for (size_t i = 0; i < cands.size() && (int)out.size() < g.R; ++i) {
    if (removed[i]) continue;
    int s = cands[i].second;
    if (s == p || s < 0) continue;
    out.push_back(s);
    const float* sv = g.pts + (size_t)s * g.dim;
    for (size_t j = i + 1; j < cands.size(); ++j) {
      if (removed[j]) continue;
      int t = cands[j].second;
      float dst = l2_sq(sv, g.pts + (size_t)t * g.dim, g.dim);
      if (alpha * dst <= cands[j].first) removed[j] = 1;
    }
  }
}

static void build_vamana(Graph& g, int L, float alpha_final) {
  std::mt19937 rng(12345);
  // random R-regular init
  std::uniform_int_distribution<int> uni(0, g.n - 2);
  g.nbrs.assign(g.n, {});
  for (int i = 0; i < g.n; ++i) {
    g.nbrs[i].reserve(g.R + 1);
    for (int r = 0; r < g.R; ++r) {
      int v = uni(rng);
      if (v >= i) ++v;
      g.nbrs[i].push_back(v);
    }
  }
  // sampled medoid
  {
    int sample = std::min(g.n, 1000);
    double best = 1e300;
    for (int c = 0; c < sample; ++c) {
      double s = 0;
      for (int t = 0; t < sample; ++t)
        s += l2_sq(g.pts + (size_t)c * g.dim, g.pts + (size_t)t * g.dim, g.dim);
      if (s < best) { best = s; g.medoid = c; }
    }
  }
  std::vector<int> order(g.n);
  for (int i = 0; i < g.n; ++i) order[i] = i;

  for (int pass = 0; pass < 2; ++pass) {
    float alpha = pass == 0 ? 1.0f : alpha_final;
    std::shuffle(order.begin(), order.end(), rng);
    for (int idx : order) {
      const float* q = g.pts + (size_t)idx * g.dim;
      std::vector<int> visited;
      greedy_search(g, q, L, &visited);
      std::vector<std::pair<float, int>> cands;
      cands.reserve(visited.size() + g.nbrs[idx].size());
      for (int v : visited)
        if (v != idx) cands.emplace_back(l2_sq(q, g.pts + (size_t)v * g.dim, g.dim), v);
      for (int v : g.nbrs[idx])
        if (v != idx) cands.emplace_back(l2_sq(q, g.pts + (size_t)v * g.dim, g.dim), v);
      std::vector<int> pruned;
      robust_prune(g, idx, cands, alpha, pruned);
      g.nbrs[idx] = pruned;
      // reverse edges: append if absent; re-prune on overflow
      for (int v : pruned) {
        auto& lst = g.nbrs[v];
        bool dup = false;
        for (int x : lst) if (x == idx) { dup = true; break; }
        if (dup) continue;
        lst.push_back(idx);
        if ((int)lst.size() > g.R) {
          const float* vv = g.pts + (size_t)v * g.dim;
          std::vector<std::pair<float, int>> vc;
          vc.reserve(lst.size());
          for (int x : lst)
            vc.emplace_back(l2_sq(vv, g.pts + (size_t)x * g.dim, g.dim), x);
          std::vector<int> vp;
          robust_prune(g, v, vc, alpha, vp);
          lst = vp;
        }
      }
    }
  }
}

static std::vector<float> read_f32(const char* path, size_t count) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  std::vector<float> buf(count);
  if (fread(buf.data(), 4, count, f) != count) {
    fprintf(stderr, "short read on %s\n", path);
    exit(1);
  }
  fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  if (argc < 11) {
    fprintf(stderr,
            "usage: %s data.bin n dim queries.bin nq R L_build alpha k Ls\n",
            argv[0]);
    return 1;
  }
  const char* data_path = argv[1];
  int n = atoi(argv[2]);
  int dim = atoi(argv[3]);
  const char* q_path = argv[4];
  int nq = atoi(argv[5]);
  int R = atoi(argv[6]);
  int Lb = atoi(argv[7]);
  float alpha = atof(argv[8]);
  int k = atoi(argv[9]);
  std::vector<int> Ls;
  {
    std::string s(argv[10]);
    size_t pos = 0;
    while (pos < s.size()) {
      size_t c = s.find(',', pos);
      if (c == std::string::npos) c = s.size();
      Ls.push_back(atoi(s.substr(pos, c - pos).c_str()));
      pos = c + 1;
    }
  }

  auto data = read_f32(data_path, (size_t)n * dim);
  auto queries = read_f32(q_path, (size_t)nq * dim);

  Graph g;
  g.n = n; g.R = R; g.dim = dim; g.pts = data.data();

  auto t0 = clk::now();
  build_vamana(g, Lb, alpha);
  double build_s = std::chrono::duration<double>(clk::now() - t0).count();

  // brute-force ground truth
  std::vector<std::vector<int>> gt(nq);
  for (int qi = 0; qi < nq; ++qi) {
    const float* q = queries.data() + (size_t)qi * dim;
    std::priority_queue<std::pair<float, int>> heap;
    for (int i = 0; i < n; ++i) {
      float d = l2_sq(q, data.data() + (size_t)i * dim, dim);
      if ((int)heap.size() < k || d < heap.top().first) {
        heap.emplace(d, i);
        if ((int)heap.size() > k) heap.pop();
      }
    }
    while (!heap.empty()) { gt[qi].push_back(heap.top().second); heap.pop(); }
  }

  printf("{\"build_seconds\": %.2f, \"sweep\": [", build_s);
  bool first = true;
  for (int L : Ls) {
    auto ts = clk::now();
    int hits = 0;
    for (int qi = 0; qi < nq; ++qi) {
      auto res = greedy_search(g, queries.data() + (size_t)qi * dim, L, nullptr);
      int kk = std::min(k, (int)res.size());
      for (int i = 0; i < kk; ++i)
        for (int j : gt[qi])
          if (res[i].second == j) { ++hits; break; }
    }
    double dt = std::chrono::duration<double>(clk::now() - ts).count();
    double recall = (double)hits / ((double)nq * k);
    double qps = nq / dt;
    printf("%s{\"L\": %d, \"recall\": %.4f, \"qps\": %.1f}",
           first ? "" : ", ", L, recall, qps);
    first = false;
  }
  printf("]}\n");
  return 0;
}
