// dgl_tpu host-side native ops.
//
// TPU-native equivalents of the reference's C++ hot loops that stay on the
// host in this architecture (device kernels are XLA/Pallas; these feed them
// fixed-shape arrays):
//   - coo_to_csr: graph construction sort (reference src/array/cpu/coo_sort.cc)
//   - sample_neighbors_fixed: per-seed rowwise pick, OpenMP-parallel
//     (reference src/array/cpu/rowwise_pick.h:27-50,
//      graphbolt/src/fused_csc_sampling_graph.cc:779)
//   - unique_and_compact: id relabeling hashmap
//     (reference src/array/cpu/concurrent_id_hash_map.cc,
//      graphbolt/src/unique_and_compact.cc)
//   - random_walk: metapath-free uniform walks
//     (reference src/graph/sampling/randomwalks/)
//
// C ABI, consumed via ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <unordered_map>
#include <vector>

#include <unistd.h>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Stable counting-sort COO -> CSR. indptr: (num_rows+1), order: (E,)
// (positions of edges sorted by row, stable).
void coo_to_csr(const int64_t* rows, int64_t num_edges, int64_t num_rows,
                int64_t* indptr, int64_t* order) {
  std::vector<int64_t> counts(num_rows + 2, 0);
  for (int64_t e = 0; e < num_edges; ++e) counts[rows[e] + 1]++;
  for (int64_t r = 0; r < num_rows + 1; ++r) counts[r + 1] += counts[r];
  std::memcpy(indptr, counts.data(), sizeof(int64_t) * (num_rows + 1));
  std::vector<int64_t> cursor(counts.begin(), counts.begin() + num_rows + 1);
  for (int64_t e = 0; e < num_edges; ++e) {
    order[cursor[rows[e]]++] = e;
  }
}

// Fixed-shape neighbor sampling over CSC/CSR. Outputs (num_seeds, fanout)
// neighbor ids, edge ids and a 0/1 mask. Per-seed deterministic PCG-style
// seeding: seed ^ hash(seed_node) so results are reproducible and
// parallelism-invariant (reference RandomEngine semantics).
void sample_neighbors_fixed(const int64_t* indptr, const int64_t* indices,
                            const int64_t* eids, const int64_t* seeds,
                            int64_t num_seeds, int64_t fanout, int replace,
                            uint64_t seed, int64_t* out_nbr, int64_t* out_eid,
                            uint8_t* out_mask) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < num_seeds; ++i) {
    const int64_t s = seeds[i];
    const int64_t lo = indptr[s], hi = indptr[s + 1];
    const int64_t deg = hi - lo;
    int64_t* nbr = out_nbr + i * fanout;
    int64_t* eid = out_eid + i * fanout;
    uint8_t* msk = out_mask + i * fanout;
    std::fill(nbr, nbr + fanout, 0);
    std::fill(eid, eid + fanout, 0);
    std::fill(msk, msk + fanout, 0);
    if (deg == 0) continue;
    std::mt19937_64 rng(seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(s + 1)));
    if (deg <= fanout && !replace) {
      for (int64_t j = 0; j < deg; ++j) {
        nbr[j] = indices[lo + j];
        eid[j] = eids ? eids[lo + j] : lo + j;
        msk[j] = 1;
      }
    } else if (replace) {
      for (int64_t j = 0; j < fanout; ++j) {
        int64_t k = (int64_t)(rng() % (uint64_t)deg);
        nbr[j] = indices[lo + k];
        eid[j] = eids ? eids[lo + k] : lo + k;
        msk[j] = 1;
      }
    } else {
      // partial Fisher-Yates over a scratch index array
      std::vector<int64_t> idx(deg);
      for (int64_t j = 0; j < deg; ++j) idx[j] = j;
      for (int64_t j = 0; j < fanout; ++j) {
        int64_t k = j + (int64_t)(rng() % (uint64_t)(deg - j));
        std::swap(idx[j], idx[k]);
        nbr[j] = indices[lo + idx[j]];
        eid[j] = eids ? eids[lo + idx[j]] : lo + idx[j];
        msk[j] = 1;
      }
    }
  }
}

// Weighted rowwise pick (reference GetSamplingNumPicksFn / GetSamplingPickFn,
// src/array/cpu/rowwise_sampling.cc:33-73): only positive-weight edges are
// candidates; !replace picks min(fanout, #positive) distinct edges with
// probability proportional to weight (Efraimidis-Spirakis reservoir keys
// u^(1/w)); replace draws fanout times via inverse-CDF on a per-row prefix
// sum. `prob` is indexed by EDGE ID (prob[eids[lo+j]]).
void sample_neighbors_prob(const int64_t* indptr, const int64_t* indices,
                           const int64_t* eids, const double* prob,
                           const int64_t* seeds, int64_t num_seeds,
                           int64_t fanout, int replace, uint64_t seed,
                           int64_t* out_nbr, int64_t* out_eid,
                           uint8_t* out_mask) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < num_seeds; ++i) {
    const int64_t s = seeds[i];
    const int64_t lo = indptr[s], hi = indptr[s + 1];
    const int64_t deg = hi - lo;
    int64_t* nbr = out_nbr + i * fanout;
    int64_t* eid = out_eid + i * fanout;
    uint8_t* msk = out_mask + i * fanout;
    std::fill(nbr, nbr + fanout, 0);
    std::fill(eid, eid + fanout, 0);
    std::fill(msk, msk + fanout, 0);
    if (deg == 0) continue;
    std::mt19937_64 rng(seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(s + 1)));
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    // positive-weight candidates
    std::vector<int64_t> cand;
    cand.reserve(deg);
    double total = 0.0;
    for (int64_t j = 0; j < deg; ++j) {
      const double w = prob[eids[lo + j]];
      if (w > 0) {
        cand.push_back(j);
        total += w;
      }
    }
    if (cand.empty()) continue;
    if (replace) {
      // inverse-CDF over the positive weights
      std::vector<double> cdf(cand.size());
      double acc = 0.0;
      for (size_t c = 0; c < cand.size(); ++c) {
        acc += prob[eids[lo + cand[c]]];
        cdf[c] = acc;
      }
      for (int64_t j = 0; j < fanout; ++j) {
        const double r = uni(rng) * total;
        const size_t c =
            std::lower_bound(cdf.begin(), cdf.end(), r) - cdf.begin();
        const int64_t p = cand[std::min(c, cand.size() - 1)];
        nbr[j] = indices[lo + p];
        eid[j] = eids[lo + p];
        msk[j] = 1;
      }
    } else {
      const int64_t take = std::min<int64_t>(fanout, (int64_t)cand.size());
      if ((int64_t)cand.size() == take) {
        for (int64_t j = 0; j < take; ++j) {
          nbr[j] = indices[lo + cand[j]];
          eid[j] = eids[lo + cand[j]];
          msk[j] = 1;
        }
      } else {
        // Efraimidis-Spirakis: top-`take` by key u^(1/w) (log-space)
        std::vector<std::pair<double, int64_t>> keys(cand.size());
        for (size_t c = 0; c < cand.size(); ++c) {
          const double w = prob[eids[lo + cand[c]]];
          keys[c] = {std::log(uni(rng) + 1e-300) / w, cand[c]};
        }
        std::nth_element(
            keys.begin(), keys.begin() + take - 1, keys.end(),
            [](const auto& a, const auto& b) { return a.first > b.first; });
        for (int64_t j = 0; j < take; ++j) {
          const int64_t p = keys[j].second;
          nbr[j] = indices[lo + p];
          eid[j] = eids[lo + p];
          msk[j] = 1;
        }
      }
    }
  }
}

// Rowwise top-k by edge weight (reference SelectTopK,
// src/graph/sampling/neighbor/neighbor.cc `_CAPI_DGLSampleNeighborsTopk`):
// per seed the k largest (descending=1) or smallest weights; ties broken by
// edge position for determinism. `weight` indexed by EDGE ID.
void select_topk_rows(const int64_t* indptr, const int64_t* indices,
                      const int64_t* eids, const double* weight,
                      const int64_t* seeds, int64_t num_seeds, int64_t k,
                      int descending, int64_t* out_nbr, int64_t* out_eid,
                      uint8_t* out_mask) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < num_seeds; ++i) {
    const int64_t s = seeds[i];
    const int64_t lo = indptr[s], hi = indptr[s + 1];
    const int64_t deg = hi - lo;
    int64_t* nbr = out_nbr + i * k;
    int64_t* eid = out_eid + i * k;
    uint8_t* msk = out_mask + i * k;
    std::fill(nbr, nbr + k, 0);
    std::fill(eid, eid + k, 0);
    std::fill(msk, msk + k, 0);
    if (deg == 0) continue;
    const int64_t take = std::min<int64_t>(k, deg);
    std::vector<int64_t> idx(deg);
    for (int64_t j = 0; j < deg; ++j) idx[j] = j;
    auto cmp = [&](int64_t a, int64_t b) {
      const double wa = weight[eids[lo + a]], wb = weight[eids[lo + b]];
      if (wa != wb) return descending ? (wa > wb) : (wa < wb);
      return a < b;
    };
    std::partial_sort(idx.begin(), idx.begin() + take, idx.end(), cmp);
    for (int64_t j = 0; j < take; ++j) {
      nbr[j] = indices[lo + idx[j]];
      eid[j] = eids[lo + idx[j]];
      msk[j] = 1;
    }
  }
}

// unique + relabel: ids (n,) -> out_unique gets unique ids in order of first
// appearance (seeds first if they prefix the array); out_relabel (n,) maps
// each input to its position in out_unique. Returns unique count.
int64_t unique_and_compact(const int64_t* ids, int64_t n, int64_t* out_unique,
                           int64_t* out_relabel) {
  std::unordered_map<int64_t, int64_t> map;
  map.reserve((size_t)n * 2);
  int64_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    auto it = map.find(ids[i]);
    if (it == map.end()) {
      map.emplace(ids[i], next);
      out_unique[next] = ids[i];
      out_relabel[i] = next;
      ++next;
    } else {
      out_relabel[i] = it->second;
    }
  }
  return next;
}

// Uniform random walks over CSR. traces: (num_seeds, length+1), -1 padded.
void random_walk_uniform(const int64_t* indptr, const int64_t* indices,
                         const int64_t* seeds, int64_t num_seeds,
                         int64_t length, uint64_t seed, int64_t* traces) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < num_seeds; ++i) {
    std::mt19937_64 rng(seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(i + 1)));
    int64_t* row = traces + i * (length + 1);
    int64_t cur = seeds[i];
    row[0] = cur;
    int64_t step = 1;
    for (; step <= length; ++step) {
      const int64_t lo = indptr[cur], hi = indptr[cur + 1];
      const int64_t deg = hi - lo;
      if (deg == 0) break;
      cur = indices[lo + (int64_t)(rng() % (uint64_t)deg)];
      row[step] = cur;
    }
    for (; step <= length; ++step) row[step] = -1;
  }
}

// Open-addressing hash table (linear probing, power-of-two capacity):
// 3-5x faster than std::unordered_map for the relabel hot loop.
struct FastMap {
  std::vector<int64_t> keys;
  std::vector<int64_t> vals;
  uint64_t mask;
  explicit FastMap(size_t want) {
    size_t cap = 16;
    while (cap < want * 2) cap <<= 1;
    keys.assign(cap, -1);
    vals.assign(cap, 0);
    mask = cap - 1;
  }
  // returns existing value or -1 if inserted with `val`
  inline int64_t get_or_insert(int64_t key, int64_t val) {
    uint64_t h = (uint64_t)key * 0x9e3779b97f4a7c15ULL;
    uint64_t i = h & mask;
    while (true) {
      if (keys[i] == key) return vals[i];
      if (keys[i] == -1) {
        keys[i] = key;
        vals[i] = val;
        return -1;
      }
      i = (i + 1) & mask;
    }
  }
};

// In-degree-bounded padded block build: one layer of the fixed-shape MFG
// sampler fused in native code (sampling + dedup + relabel in one pass).
// seeds: (cap_dst,) with -1 padding; outputs sized as in the Python
// reference implementation (dataloading/neighbor_sampler.py).
void build_padded_block(const int64_t* indptr, const int64_t* indices,
                        const int64_t* eids, const int64_t* seed_ids,
                        int64_t cap_dst, int64_t fanout, int replace,
                        uint64_t seed,
                        int64_t* src_ids,    // (cap_src,) init to -1 by caller
                        int64_t* esrc,       // (Ecap,)
                        int64_t* edst,       // (Ecap,)
                        int64_t* eids_out,   // (Ecap,)
                        uint8_t* emask) {    // (Ecap,)
  const int64_t cap_src = cap_dst * (1 + fanout);
  const int64_t Ecap = cap_dst * fanout;
  const int64_t sink = cap_dst - 1;
  FastMap lookup((size_t)cap_src);
  for (int64_t i = 0; i < cap_dst; ++i) {
    src_ids[i] = seed_ids[i];
    if (seed_ids[i] >= 0) lookup.get_or_insert(seed_ids[i], i);
  }
  for (int64_t e = 0; e < Ecap; ++e) {
    esrc[e] = sink;
    edst[e] = sink;
    eids_out[e] = 0;
    emask[e] = 0;
  }
  int64_t next = cap_dst;
  for (int64_t slot = 0; slot < cap_dst; ++slot) {
    const int64_t s = seed_ids[slot];
    if (s < 0) continue;
    const int64_t lo = indptr[s], hi = indptr[s + 1];
    const int64_t deg = hi - lo;
    if (deg == 0) continue;
    std::mt19937_64 rng(seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(s + 1)));
    int64_t take = (deg <= fanout && !replace) ? deg : fanout;
    std::vector<int64_t> pick(take);
    if (deg <= fanout && !replace) {
      for (int64_t j = 0; j < take; ++j) pick[j] = j;
    } else if (replace) {
      for (int64_t j = 0; j < take; ++j)
        pick[j] = (int64_t)(rng() % (uint64_t)deg);
    } else {
      std::vector<int64_t> idx(deg);
      for (int64_t j = 0; j < deg; ++j) idx[j] = j;
      for (int64_t j = 0; j < take; ++j) {
        int64_t k = j + (int64_t)(rng() % (uint64_t)(deg - j));
        std::swap(idx[j], idx[k]);
        pick[j] = idx[j];
      }
    }
    for (int64_t j = 0; j < take; ++j) {
      const int64_t u = indices[lo + pick[j]];
      int64_t loc = lookup.get_or_insert(u, next);
      if (loc < 0) {
        loc = next;
        src_ids[next] = u;
        ++next;
      }
      const int64_t pos = slot * fanout + j;
      esrc[pos] = loc;
      edst[pos] = slot;
      eids_out[pos] = eids ? eids[lo + pick[j]] : lo + pick[j];
      emask[pos] = 1;
    }
  }
}

// Greedy heavy-edge matching for multilevel coarsening (reference METIS
// HEM stage, src/graph/metis_partition.cc): edges arrive pre-sorted by
// descending weight; the sequential greedy scan is exact and O(E).
// matched[v] = representative node id of v's pair (v itself if unmatched).
void hem_match(const int32_t* rows, const int32_t* cols, int64_t num_edges,
               int64_t num_nodes, int64_t* matched) {
  for (int64_t v = 0; v < num_nodes; ++v) matched[v] = -1;
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t u = rows[e], v = cols[e];
    if (matched[u] < 0 && matched[v] < 0) {
      matched[u] = u;
      matched[v] = u;
    }
  }
  for (int64_t v = 0; v < num_nodes; ++v)
    if (matched[v] < 0) matched[v] = v;
}



// Per-edge-type fixed-fanout pick (reference src/array/cpu/rowwise_pick.h
// CSRRowWisePerEtypePick, graph_services.py sample_etype_neighbors): for
// each seed and edge type t, sample up to fanouts[t] in-edges of type t
// without replacement. Slot layout per seed: [offs[t] + j] where offs is
// the exclusive prefix sum of fanouts — the STATIC slot-etype layout the
// hetero distributed sampler exposes to RelGraphConv. type_per_edge is
// indexed by EDGE ID (type_per_edge[eids[pos]]).
void sample_neighbors_etype(const int64_t* indptr, const int64_t* indices,
                            const int64_t* eids,
                            const int64_t* type_per_edge, int64_t num_types,
                            const int64_t* fanouts, const int64_t* seeds,
                            int64_t num_seeds, int replace, uint64_t seed,
                            int64_t* out_nbr, int64_t* out_eid,
                            uint8_t* out_mask) {
  std::vector<int64_t> offs(num_types + 1, 0);
  for (int64_t t = 0; t < num_types; ++t) offs[t + 1] = offs[t] + fanouts[t];
  const int64_t F_total = offs[num_types];
#pragma omp parallel
  {
    std::vector<std::vector<int64_t>> buckets(num_types);
#pragma omp for schedule(dynamic, 32)
    for (int64_t i = 0; i < num_seeds; ++i) {
      const int64_t s = seeds[i];
      int64_t* nbr = out_nbr + i * F_total;
      int64_t* eid = out_eid + i * F_total;
      uint8_t* msk = out_mask + i * F_total;
      std::fill(nbr, nbr + F_total, 0);
      std::fill(eid, eid + F_total, 0);
      std::fill(msk, msk + F_total, 0);
      if (s < 0) continue;
      const int64_t lo = indptr[s], hi = indptr[s + 1];
      if (hi <= lo) continue;
      for (auto& b : buckets) b.clear();
      for (int64_t pos = lo; pos < hi; ++pos) {
        const int64_t e = eids ? eids[pos] : pos;
        const int64_t t = type_per_edge[e];
        if (t >= 0 && t < num_types) buckets[t].push_back(pos);
      }
      std::mt19937_64 rng(seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(s + 1)));
      for (int64_t t = 0; t < num_types; ++t) {
        const int64_t f = fanouts[t];
        auto& cand = buckets[t];
        const int64_t deg = (int64_t)cand.size();
        if (f == 0 || deg == 0) continue;
        int64_t* tn = nbr + offs[t];
        int64_t* te = eid + offs[t];
        uint8_t* tm = msk + offs[t];
        if (deg <= f && !replace) {
          for (int64_t j = 0; j < deg; ++j) {
            tn[j] = indices[cand[j]];
            te[j] = eids ? eids[cand[j]] : cand[j];
            tm[j] = 1;
          }
        } else if (replace) {
          for (int64_t j = 0; j < f; ++j) {
            int64_t k = (int64_t)(rng() % (uint64_t)deg);
            tn[j] = indices[cand[k]];
            te[j] = eids ? eids[cand[k]] : cand[k];
            tm[j] = 1;
          }
        } else {
          for (int64_t j = 0; j < f; ++j) {
            int64_t k = j + (int64_t)(rng() % (uint64_t)(deg - j));
            std::swap(cand[j], cand[k]);
            tn[j] = indices[cand[j]];
            te[j] = eids ? eids[cand[j]] : cand[j];
            tm[j] = 1;
          }
        }
      }
    }
  }
}

// Batched random row reads straight from an fd (out-of-core feature
// fetch). The io_uring analog of the reference's OnDiskNpyArray
// (graphbolt/src/cnumpy.h:9, io_uring.cc): many parallel preads keep the
// disk queue full without mapping the file, so process RSS stays bounded
// by the output buffer no matter how large the feature table is. Rows are
// gathered per-id: out[i] = file[offset0 + ids[i]*row_bytes : +row_bytes].
// Returns the number of rows fully read (== n on success).
int64_t batched_pread(int fd, int64_t offset0, const int64_t* ids,
                      int64_t n, int64_t row_bytes, char* out) {
  int64_t ok = 0;
#pragma omp parallel for schedule(dynamic, 64) reduction(+ : ok)
  for (int64_t i = 0; i < n; ++i) {
    int64_t off = offset0 + ids[i] * row_bytes;
    int64_t got = 0;
    while (got < row_bytes) {
      ssize_t r = pread(fd, out + i * row_bytes + got, row_bytes - got,
                        off + got);
      if (r <= 0) break;
      got += r;
    }
    ok += (got == row_bytes) ? 1 : 0;
  }
  return ok;
}

// Parallel grouped-CSR aggregation: group (row, col) pairs, sum weights,
// emit canonical CSR (sorted unique cols per row). The partitioner's
// coarsening chain is built on this (symmetrize + coarse-graph build were
// 300-400 s/level in scipy at 190M nnz; reference counterpart: the METIS
// coarsening phase, src/graph/metis_partition.cc).
//   rows/cols: m int32 pairs; w: m float weights or NULL (-> 1.0)
//   skip_diag: drop row==col pairs
//   indptr: n+1 int64 out; out_cols/out_w: capacity m
// Returns nnz of the aggregated matrix.
// row_cap > 0 keeps only each row's row_cap HEAVIEST entries (the
// structure-aware dense-coarse prune: a global weight threshold with
// random tie-dropping destroyed partition quality at 500M edges —
// cut ratio 8.3x planted — because weight-1 ties carry the community
// signal; per-row selection keeps every supernode connected to its
// strongest neighbors).
int64_t aggregate_csr(const int32_t* rows, const int32_t* cols,
                      const float* w, int64_t m, int64_t n, int skip_diag,
                      int64_t row_cap,
                      int64_t* indptr, int32_t* out_cols, float* out_w) {
  int T = 1;
#ifdef _OPENMP
  T = omp_get_max_threads();
#endif
  // pass 1: per-thread per-row histograms over contiguous input chunks
  // (no atomics, no critical merge — the merge is parallel over rows).
  // Each histogram is n*8 bytes; cap the thread count so the total stays
  // bounded (<=16 threads AND <=16 GB) — at n ~ 1e8 on a many-core host
  // an uncapped T would allocate tens of GB of histograms alone.
  {
    int64_t mem_cap = (16LL << 30) / std::max<int64_t>(n * 8, 1);
    T = (int)std::min<int64_t>(T, std::max<int64_t>(
        1, std::min<int64_t>(16, mem_cap)));
  }
  std::vector<std::vector<int64_t>> hist(T);
  int64_t chunk = (m + T - 1) / T;
#pragma omp parallel num_threads(T)
  {
    int t = 0;
#ifdef _OPENMP
    t = omp_get_thread_num();
#endif
    hist[t].assign(n, 0);
    int64_t lo = t * chunk, hi = std::min(m, lo + chunk);
    for (int64_t i = lo; i < hi; ++i) {
      if (skip_diag && rows[i] == cols[i]) continue;
      hist[t][rows[i]]++;
    }
  }
  std::vector<int64_t> cnt(n + 1, 0);
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n; ++r) {
    int64_t s = 0;
    for (int t = 0; t < T; ++t) {
      int64_t h = hist[t][r];
      hist[t][r] = s;  // becomes the thread's within-row offset
      s += h;
    }
    cnt[r + 1] = s;
  }
  for (int64_t r = 0; r < n; ++r) cnt[r + 1] += cnt[r];
  // pass 2: each thread re-scans its chunk and writes at
  // cnt[row] + hist[t][row]++ — disjoint positions, no atomics
  std::vector<int32_t> tc(cnt[n]);
  std::vector<float> tw(cnt[n]);
#pragma omp parallel num_threads(T)
  {
    int t = 0;
#ifdef _OPENMP
    t = omp_get_thread_num();
#endif
    int64_t lo = t * chunk, hi = std::min(m, lo + chunk);
    for (int64_t i = lo; i < hi; ++i) {
      if (skip_diag && rows[i] == cols[i]) continue;
      int64_t p = cnt[rows[i]] + hist[t][rows[i]]++;
      tc[p] = cols[i];
      tw[p] = w ? w[i] : 1.0f;
    }
  }
  // pass 3: per-row sort + dedup-sum. Rows are sorted as packed
  // (col << 32 | slot) keys in a thread-local scratch (one std::sort on
  // 8-byte keys beats pair sorts; insertion sort for short rows).
  std::vector<int64_t> rn(n, 0);
#pragma omp parallel
  {
    std::vector<uint64_t> keys;
    std::vector<float> vals;
#pragma omp for schedule(dynamic, 256)
    for (int64_t r = 0; r < n; ++r) {
      int64_t a = cnt[r], b = cnt[r + 1];
      if (a == b) continue;
      int64_t len = b - a;
      keys.resize(len);
      for (int64_t i = 0; i < len; ++i)
        keys[i] = ((uint64_t)(uint32_t)tc[a + i] << 32) | (uint32_t)i;
      if (len <= 48) {
        for (int64_t i = 1; i < len; ++i) {
          uint64_t k = keys[i];
          int64_t j = i - 1;
          while (j >= 0 && keys[j] > k) {
            keys[j + 1] = keys[j];
            --j;
          }
          keys[j + 1] = k;
        }
      } else {
        std::sort(keys.begin(), keys.end());
      }
      // stage values in sorted order BEFORE writing tw (a write at
      // position `out` must not clobber a slot a later key still reads)
      vals.resize(len);
      for (int64_t i = 0; i < len; ++i)
        vals[i] = tw[a + (uint32_t)keys[i]];
      int64_t out = a;
      int32_t cur = (int32_t)(keys[0] >> 32);
      float acc = vals[0];
      for (int64_t i = 1; i < len; ++i) {
        int32_t col = (int32_t)(keys[i] >> 32);
        if (col == cur) {
          acc += vals[i];
        } else {
          tc[out] = cur;
          tw[out] = acc;
          ++out;
          cur = col;
          acc = vals[i];
        }
      }
      tc[out] = cur;
      tw[out] = acc;
      ++out;
      rn[r] = out - a;
      if (row_cap > 0 && rn[r] > row_cap) {
        // keep the row_cap heaviest entries, restored to col order
        int64_t len2 = rn[r];
        keys.resize(len2);
        for (int64_t i = 0; i < len2; ++i)
          keys[i] = ((uint64_t)(uint32_t)i << 32) | (uint32_t)i;
        // sort positions by weight desc (pack weight rank via nth)
        std::vector<uint64_t>& ks = keys;
        std::nth_element(
            ks.begin(), ks.begin() + row_cap - 1, ks.end(),
            [&](uint64_t x, uint64_t y) {
              return tw[a + (uint32_t)x] > tw[a + (uint32_t)y];
            });
        std::sort(ks.begin(), ks.begin() + row_cap);  // back to col order
        vals.resize(row_cap);
        std::vector<int32_t> cc(row_cap);
        for (int64_t i = 0; i < row_cap; ++i) {
          cc[i] = tc[a + (uint32_t)ks[i]];
          vals[i] = tw[a + (uint32_t)ks[i]];
        }
        for (int64_t i = 0; i < row_cap; ++i) {
          tc[a + i] = cc[i];
          tw[a + i] = vals[i];
        }
        rn[r] = row_cap;
      }
    }
  }
  // pass 4: prefix the per-row nnz and compact
  indptr[0] = 0;
  for (int64_t r = 0; r < n; ++r) indptr[r + 1] = indptr[r] + rn[r];
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t r = 0; r < n; ++r) {
    int64_t src0 = cnt[r], dst0 = indptr[r], k = rn[r];
    for (int64_t i = 0; i < k; ++i) {
      out_cols[dst0 + i] = tc[src0 + i];
      out_w[dst0 + i] = tw[src0 + i];
    }
  }
  return indptr[n];
}

// k-way refinement gains (the O(E) inner loop of
// dgl_tpu/distributed/partition.py::_kway_refine — the single-thread
// numpy bincount there was ~40% of the 500M-edge partition wall):
// for each node, connectivity to every part over its CSR row;
// best = argmax over parts != own, gain = conn[best] - conn[own].
void kway_gains(const int64_t* indptr, const int32_t* indices,
                const float* w, const int64_t* parts, int64_t n,
                int64_t k, int32_t* best, float* gain) {
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<double> conn(k);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 2048)
#endif
    for (int64_t r = 0; r < n; ++r) {
      std::fill(conn.begin(), conn.end(), 0.0);
      for (int64_t i = indptr[r]; i < indptr[r + 1]; ++i)
        conn[parts[indices[i]]] += w ? (double)w[i] : 1.0;
      int64_t own = parts[r];
      int64_t b = (own == 0) ? 1 : 0;
      for (int64_t p = 0; p < k; ++p)
        if (p != own && conn[p] > conn[b]) b = p;
      best[r] = (int32_t)b;
      gain[r] = (float)(conn[b] - conn[own]);
    }
  }
}

}  // extern "C"
