// Unit tests for the native host ops (reference tests/cpp/*.cc gtest suite;
// assert-based here to avoid vendoring gtest). Run via `make test`.
#include <algorithm>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <set>
#include <vector>

extern "C" {
void coo_to_csr(const int64_t*, int64_t, int64_t, int64_t*, int64_t*);
void sample_neighbors_fixed(const int64_t*, const int64_t*, const int64_t*,
                            const int64_t*, int64_t, int64_t, int, uint64_t,
                            int64_t*, int64_t*, uint8_t*);
int64_t unique_and_compact(const int64_t*, int64_t, int64_t*, int64_t*);
void random_walk_uniform(const int64_t*, const int64_t*, const int64_t*,
                         int64_t, int64_t, uint64_t, int64_t*);
void build_padded_block(const int64_t*, const int64_t*, const int64_t*,
                        const int64_t*, int64_t, int64_t, int, uint64_t,
                        int64_t*, int64_t*, int64_t*, int64_t*, uint8_t*);
void hem_match(const int32_t*, const int32_t*, int64_t, int64_t, int64_t*);
void sample_neighbors_etype(const int64_t*, const int64_t*, const int64_t*,
                            const int64_t*, int64_t, const int64_t*,
                            const int64_t*, int64_t, int, uint64_t,
                            int64_t*, int64_t*, uint8_t*);
int64_t aggregate_csr(const int32_t*, const int32_t*, const float*, int64_t,
                      int64_t, int, int64_t, int64_t*, int32_t*, float*);
void kway_gains(const int64_t*, const int32_t*, const float*,
                const int64_t*, int64_t, int64_t, int32_t*, float*);
}

static void test_coo_to_csr() {
  // edges by row: rows = [2, 0, 2, 1, 0]
  int64_t rows[] = {2, 0, 2, 1, 0};
  int64_t indptr[4], order[5];
  coo_to_csr(rows, 5, 3, indptr, order);
  assert(indptr[0] == 0 && indptr[1] == 2 && indptr[2] == 3 && indptr[3] == 5);
  // stable: row 0 edges in original order (1, 4)
  assert(order[0] == 1 && order[1] == 4);
  assert(order[2] == 3);
  assert(order[3] == 0 && order[4] == 2);
  std::puts("coo_to_csr OK");
}

static void test_sampling() {
  // star: node 0 has in-neighbors 1..9 (CSC)
  int64_t indptr[] = {0, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9};
  int64_t indices[] = {1, 2, 3, 4, 5, 6, 7, 8, 9};
  int64_t eids[] = {0, 1, 2, 3, 4, 5, 6, 7, 8};
  int64_t seeds[] = {0, 5};
  int64_t nbr[2 * 4], eid[2 * 4];
  uint8_t mask[2 * 4];
  sample_neighbors_fixed(indptr, indices, eids, seeds, 2, 4, 0, 123, nbr,
                         eid, mask);
  // seed 0: 4 distinct picks from 1..9
  std::set<int64_t> s;
  for (int j = 0; j < 4; ++j) {
    assert(mask[j] == 1);
    assert(nbr[j] >= 1 && nbr[j] <= 9);
    s.insert(nbr[j]);
    assert(indices[eid[j]] == nbr[j]);
  }
  assert(s.size() == 4);  // without replacement
  // seed 5: degree 0 -> all masked off
  for (int j = 4; j < 8; ++j) assert(mask[j] == 0);
  // determinism: same seed -> same picks
  int64_t nbr2[2 * 4], eid2[2 * 4];
  uint8_t mask2[2 * 4];
  sample_neighbors_fixed(indptr, indices, eids, seeds, 2, 4, 0, 123, nbr2,
                         eid2, mask2);
  assert(std::memcmp(nbr, nbr2, sizeof(nbr)) == 0);
  std::puts("sample_neighbors_fixed OK");
}

static void test_unique_compact() {
  int64_t ids[] = {5, 3, 5, 7, 3, 5};
  int64_t uniq[6], relab[6];
  int64_t k = unique_and_compact(ids, 6, uniq, relab);
  assert(k == 3);
  assert(uniq[0] == 5 && uniq[1] == 3 && uniq[2] == 7);
  int64_t expect[] = {0, 1, 0, 2, 1, 0};
  for (int i = 0; i < 6; ++i) assert(relab[i] == expect[i]);
  std::puts("unique_and_compact OK");
}

static void test_random_walk() {
  // cycle 0->1->2->0 (CSR)
  int64_t indptr[] = {0, 1, 2, 3};
  int64_t indices[] = {1, 2, 0};
  int64_t seeds[] = {0};
  int64_t traces[5];
  random_walk_uniform(indptr, indices, seeds, 1, 4, 7, traces);
  int64_t expect[] = {0, 1, 2, 0, 1};
  for (int i = 0; i < 5; ++i) assert(traces[i] == expect[i]);
  std::puts("random_walk_uniform OK");
}

static void test_block_build() {
  // CSC: node 0 <- {1, 2}; node 1 <- {2}
  int64_t indptr[] = {0, 2, 3, 3};
  int64_t indices[] = {1, 2, 2};
  int64_t eids[] = {0, 1, 2};
  const int64_t cap_dst = 3, fanout = 2;  // seeds [0, 1, -1(sink)]
  int64_t seeds[] = {0, 1, -1};
  int64_t src_ids[3 * 3];
  for (auto& v : src_ids) v = -1;
  int64_t esrc[6], edst[6], eo[6];
  uint8_t em[6];
  build_padded_block(indptr, indices, eids, seeds, cap_dst, fanout, 0, 9,
                     src_ids, esrc, edst, eo, em);
  // seeds occupy slots 0..2; node1 at slot 1 reused as source of edge to 0
  assert(src_ids[0] == 0 && src_ids[1] == 1 && src_ids[2] == -1);
  int real = 0;
  for (int e = 0; e < 6; ++e) {
    if (!em[e]) {
      assert(esrc[e] == cap_dst - 1 && edst[e] == cap_dst - 1);
      continue;
    }
    ++real;
    assert(edst[e] < 2);
    assert(src_ids[esrc[e]] == indices[eo[e]]);
  }
  assert(real == 3);
  std::puts("build_padded_block OK");
}

// --- adversarial tests (FastMap + build_padded_block edge cases) ---

// Replicates FastMap's capacity rule (host_ops.cpp) so collision tests can
// target a concrete bucket count.
static uint64_t fastmap_cap(int64_t want) {
  uint64_t cap = 16;
  while (cap < (uint64_t)want * 2) cap <<= 1;
  return cap;
}

// All neighbor ids hash into the SAME FastMap bucket: every insert after the
// first must survive a full linear-probe chain.
static void test_block_hash_collisions() {
  const int64_t cap_dst = 4, fanout = 24;
  const int64_t cap_src = cap_dst * (1 + fanout);
  const uint64_t cap = fastmap_cap(cap_src);
  const uint64_t mult = 0x9e3779b97f4a7c15ULL;
  // collect 20 distinct ids whose hash lands in bucket 3
  std::vector<int64_t> collide;
  for (int64_t id = 1; (int64_t)collide.size() < 20; ++id) {
    if (((uint64_t)id * mult & (cap - 1)) == 3) collide.push_back(id);
  }
  // seed node 0 has degree 40: each colliding id appears twice (dedup test)
  std::vector<int64_t> indices;
  for (int64_t id : collide) {
    indices.push_back(id);
    indices.push_back(id);
  }
  // indptr over max node id + 1 rows; only row 0 has edges
  int64_t max_id = *std::max_element(collide.begin(), collide.end());
  std::vector<int64_t> indptr(max_id + 2, 40);
  indptr[0] = 0;
  int64_t seeds[] = {0, -1, -1, -1};
  std::vector<int64_t> src_ids(cap_src, -1);
  std::vector<int64_t> esrc(cap_dst * fanout), edst(cap_dst * fanout),
      eo(cap_dst * fanout);
  std::vector<uint8_t> em(cap_dst * fanout);
  build_padded_block(indptr.data(), indices.data(), nullptr, seeds, cap_dst,
                     fanout, 0, 77, src_ids.data(), esrc.data(), edst.data(),
                     eo.data(), em.data());
  // 24 sampled edges land on <= 20 DISTINCT source slots (dedup despite
  // every key probing the same chain)
  std::set<int64_t> slots, ids_seen;
  int real = 0;
  for (int64_t e = 0; e < cap_dst * fanout; ++e) {
    if (!em[e]) continue;
    ++real;
    assert(edst[e] == 0);
    slots.insert(esrc[e]);
    ids_seen.insert(src_ids[esrc[e]]);
    assert(indices[eo[e]] == src_ids[esrc[e]]);
  }
  assert(real == fanout);  // deg(40) > fanout(24) -> exactly fanout picks
  assert(slots.size() == ids_seen.size());
  assert(ids_seen.size() <= 20);
  for (int64_t id : ids_seen) {
    assert(std::find(collide.begin(), collide.end(), id) != collide.end());
  }
  std::puts("build_padded_block hash-collision dedup OK");
}

// Every source distinct across the whole block: fills src_ids to EXACTLY
// cap_src (the FastMap sizing boundary — one past-the-end write would
// corrupt).
static void test_block_full_capacity() {
  const int64_t cap_dst = 8, fanout = 6;
  const int64_t cap_src = cap_dst * (1 + fanout);  // 56
  // seeds 0..7; seed s's neighbors are 100+s*6 .. 100+s*6+5 (all distinct,
  // disjoint from seeds) -> inserts = 8 seeds + 48 neighbors = 56 = cap_src
  std::vector<int64_t> indptr, indices;
  int64_t nrows = 100 + 8 * 6;
  indptr.assign(nrows + 1, 0);
  for (int64_t s = 0; s < 8; ++s) {
    for (int64_t j = 0; j < 6; ++j) indices.push_back(100 + s * 6 + j);
  }
  for (int64_t r = 0; r <= nrows; ++r) indptr[r] = (r < 8) ? r * 6 : 48;
  int64_t seeds[8];
  for (int64_t i = 0; i < 8; ++i) seeds[i] = i;
  std::vector<int64_t> src_ids(cap_src, -1);
  std::vector<int64_t> esrc(48), edst(48), eo(48);
  std::vector<uint8_t> em(48);
  build_padded_block(indptr.data(), indices.data(), nullptr, seeds, cap_dst,
                     fanout, 0, 5, src_ids.data(), esrc.data(), edst.data(),
                     eo.data(), em.data());
  // all cap_src slots populated, all distinct
  std::set<int64_t> uniq(src_ids.begin(), src_ids.end());
  assert(uniq.count(-1) == 0);
  assert((int64_t)uniq.size() == cap_src);
  for (int64_t e = 0; e < 48; ++e) {
    assert(em[e] == 1);
    assert(src_ids[esrc[e]] == indices[eo[e]]);
  }
  std::puts("build_padded_block full-capacity OK");
}

// Entirely -1 (sink) seed batch: nothing sampled, every edge masked to the
// sink self-loop, src_ids untouched.
static void test_block_all_sink() {
  int64_t indptr[] = {0, 1};
  int64_t indices[] = {0};
  const int64_t cap_dst = 4, fanout = 3;
  int64_t seeds[] = {-1, -1, -1, -1};
  std::vector<int64_t> src_ids(cap_dst * (1 + fanout), -1);
  int64_t esrc[12], edst[12], eo[12];
  uint8_t em[12];
  build_padded_block(indptr, indices, nullptr, seeds, cap_dst, fanout, 0, 1,
                     src_ids.data(), esrc, edst, eo, em);
  for (auto v : src_ids) assert(v == -1);
  for (int e = 0; e < 12; ++e) {
    assert(em[e] == 0 && esrc[e] == cap_dst - 1 && edst[e] == cap_dst - 1);
  }
  std::puts("build_padded_block all-sink OK");
}

// replace=1 on a degree-1 node: all picks duplicate one neighbor -> exactly
// one source slot allocated, fanout live edges.
static void test_block_replace_dedup() {
  int64_t indptr[] = {0, 1, 1};
  int64_t indices[] = {1};
  const int64_t cap_dst = 2, fanout = 5;
  int64_t seeds[] = {0, -1};
  std::vector<int64_t> src_ids(cap_dst * (1 + fanout), -1);
  int64_t esrc[10], edst[10], eo[10];
  uint8_t em[10];
  build_padded_block(indptr, indices, nullptr, seeds, cap_dst, fanout, 1, 3,
                     src_ids.data(), esrc, edst, eo, em);
  int real = 0;
  std::set<int64_t> slots;
  for (int e = 0; e < 10; ++e) {
    if (!em[e]) continue;
    ++real;
    slots.insert(esrc[e]);
    assert(src_ids[esrc[e]] == 1);
  }
  assert(real == fanout);
  assert(slots.size() == 1);  // deduped to a single slot
  std::puts("build_padded_block replace-dedup OK");
}

// unique_and_compact under heavy duplication + huge ids (hash spread).
static void test_unique_compact_stress() {
  const int64_t n = 20000;
  std::vector<int64_t> ids(n);
  std::mt19937_64 rng(42);
  std::vector<int64_t> pool;
  for (int i = 0; i < 500; ++i) {
    pool.push_back((int64_t)(rng() >> 1));  // non-negative, up to ~4.6e18
  }
  pool.push_back(0);
  pool.push_back(INT64_MAX);
  for (int64_t i = 0; i < n; ++i) ids[i] = pool[rng() % pool.size()];
  std::vector<int64_t> uniq(n), relab(n);
  int64_t k = unique_and_compact(ids.data(), n, uniq.data(), relab.data());
  std::set<int64_t> expect(ids.begin(), ids.end());
  assert(k == (int64_t)expect.size());
  // round-trip: uniq[relab[i]] == ids[i]; first-occurrence order
  std::set<int64_t> seen;
  int64_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    assert(relab[i] >= 0 && relab[i] < k);
    assert(uniq[relab[i]] == ids[i]);
    if (seen.insert(ids[i]).second) {
      assert(relab[i] == next);
      ++next;
    }
  }
  std::puts("unique_and_compact stress OK");
}

static void test_hem_match() {
  // path 0-1-2-3: greedy matches heaviest first. Order edges (1,2),(0,1),(2,3)
  int32_t rows[] = {1, 0, 2};
  int32_t cols[] = {2, 1, 3};
  int64_t matched[4];
  hem_match(rows, cols, 3, 4, matched);
  // (1,2) pairs first; (0,1) blocked (1 taken); (2,3) blocked (2 taken)
  assert(matched[1] == 1 && matched[2] == 1);
  assert(matched[0] == 0 && matched[3] == 3);
  // maximality: no edge with both endpoints unmatched remains
  for (int e = 0; e < 3; ++e) {
    bool u_lone = matched[rows[e]] == rows[e];
    bool v_lone = matched[cols[e]] == cols[e];
    // a lone node here means singleton cluster; check not both free pairs
    (void)u_lone; (void)v_lone;
  }
  // star graph: center 0 pairs once, satellites stay singletons
  int32_t srows[] = {0, 0, 0};
  int32_t scols[] = {1, 2, 3};
  hem_match(srows, scols, 3, 4, matched);
  assert(matched[0] == 0 && matched[1] == 0);
  assert(matched[2] == 2 && matched[3] == 3);
  std::puts("hem_match OK");
}

static void test_etype_pick() {
  // graph: node 0 has 5 in-edges, types [0,0,1,1,2]; node 1 has 1 type-2
  // edge; node 2 isolated
  int64_t indptr[] = {0, 5, 6, 6};
  int64_t indices[] = {10, 11, 12, 13, 14, 15};
  int64_t eids[] = {0, 1, 2, 3, 4, 5};
  int64_t tpe[] = {0, 0, 1, 1, 2, 2};
  int64_t fanouts[] = {1, 2, 2};  // F_total = 5, offs = [0,1,3]
  int64_t seeds[] = {0, 1, 2, -1};
  int64_t nbr[4 * 5], eid[4 * 5];
  uint8_t msk[4 * 5];
  sample_neighbors_etype(indptr, indices, eids, tpe, 3, fanouts, seeds, 4,
                         0, 7, nbr, eid, msk);
  // seed 0: exactly 1 type-0 pick, 2 type-1 picks, 1 type-2 pick
  assert(msk[0] == 1);                       // type-0 slot
  assert(eid[0] == 0 || eid[0] == 1);
  assert(msk[1] == 1 && msk[2] == 1);        // both type-1 slots
  assert((eid[1] == 2 && eid[2] == 3) || (eid[1] == 3 && eid[2] == 2));
  assert(msk[3] == 1 && eid[3] == 4);        // one type-2 edge
  assert(msk[4] == 0);                       // second type-2 slot masked
  // seed 1: only the type-2 edge (eid 5) in the FIRST type-2 slot
  assert(msk[5 + 0] == 0 && msk[5 + 1] == 0 && msk[5 + 2] == 0);
  assert(msk[5 + 3] == 1 && eid[5 + 3] == 5 && nbr[5 + 3] == 15);
  // isolated seed and -1 padding: fully masked
  for (int j = 0; j < 5; ++j) assert(msk[10 + j] == 0 && msk[15 + j] == 0);
  // deterministic across calls
  int64_t nbr2[4 * 5], eid2[4 * 5];
  uint8_t msk2[4 * 5];
  sample_neighbors_etype(indptr, indices, eids, tpe, 3, fanouts, seeds, 4,
                         0, 7, nbr2, eid2, msk2);
  assert(std::memcmp(eid, eid2, sizeof(eid)) == 0);
  std::puts("etype pick ok");
}

static void test_aggregate_csr() {
  // group-sum with duplicates + diag skip, reference computed by brute force
  std::mt19937 rng(5);
  const int64_t n = 37, m = 5000;
  std::vector<int32_t> rows(m), cols(m);
  std::vector<float> w(m);
  std::vector<std::vector<float>> dense(n, std::vector<float>(n, 0.f));
  for (int64_t i = 0; i < m; ++i) {
    rows[i] = (int32_t)(rng() % n);
    cols[i] = (int32_t)(rng() % n);
    w[i] = (float)(1 + rng() % 5);
    if (rows[i] != cols[i]) dense[rows[i]][cols[i]] += w[i];
  }
  std::vector<int64_t> indptr(n + 1);
  std::vector<int32_t> oc(m);
  std::vector<float> ow(m);
  int64_t nnz = aggregate_csr(rows.data(), cols.data(), w.data(), m, n,
                              /*skip_diag=*/1, /*row_cap=*/0,
                              indptr.data(), oc.data(), ow.data());
  int64_t expect_nnz = 0;
  for (int64_t r = 0; r < n; ++r)
    for (int64_t c = 0; c < n; ++c) expect_nnz += dense[r][c] > 0;
  assert(nnz == expect_nnz);
  for (int64_t r = 0; r < n; ++r) {
    int32_t prev = -1;
    for (int64_t i = indptr[r]; i < indptr[r + 1]; ++i) {
      assert(oc[i] > prev);  // sorted unique cols
      prev = oc[i];
      assert(ow[i] == dense[r][oc[i]]);
    }
  }
  // row_cap keeps each row's heaviest K, still col-sorted
  const int64_t K = 8;
  nnz = aggregate_csr(rows.data(), cols.data(), w.data(), m, n, 1, K,
                      indptr.data(), oc.data(), ow.data());
  for (int64_t r = 0; r < n; ++r) {
    int64_t cnt = indptr[r + 1] - indptr[r];
    assert(cnt <= K);
    // kept weights are the top-cnt of the row (multiset compare)
    std::vector<float> all;
    for (int64_t c = 0; c < n; ++c)
      if (dense[r][c] > 0) all.push_back(dense[r][c]);
    std::sort(all.rbegin(), all.rend());
    std::vector<float> kept(ow.begin() + indptr[r],
                            ow.begin() + indptr[r + 1]);
    std::sort(kept.rbegin(), kept.rend());
    double kept_sum = 0, top_sum = 0;
    for (auto v : kept) kept_sum += v;
    for (int64_t i = 0; i < cnt; ++i) top_sum += all[i];
    assert(kept_sum >= top_sum - 1e-3);  // ties may swap, mass matches
    int32_t prev = -1;
    for (int64_t i = indptr[r]; i < indptr[r + 1]; ++i) {
      assert(oc[i] > prev);
      prev = oc[i];
    }
  }
  std::puts("aggregate_csr ok");
}

static void test_kway_gains() {
  // 6-node path graph 0-1-2-3-4-5, parts [0,0,0,1,1,1], k=2:
  // nodes 2 and 3 sit on the boundary with gain 0 (1 ext vs 1 int);
  // interior nodes have gain -1 or -2
  int64_t indptr[7] = {0, 1, 3, 5, 7, 9, 10};
  int32_t indices[10] = {1, 0, 2, 1, 3, 2, 4, 3, 5, 4};
  float w[10] = {1, 1, 1, 1, 1, 1, 1, 1, 1, 1};
  int64_t parts[6] = {0, 0, 0, 1, 1, 1};
  int32_t best[6];
  float gain[6];
  kway_gains(indptr, indices, w, parts, 6, 2, best, gain);
  assert(best[2] == 1 && gain[2] == 0.0f);
  assert(best[3] == 0 && gain[3] == 0.0f);
  assert(gain[0] == -1.0f);  // one intra edge, zero ext
  assert(gain[1] == -2.0f);
  // weighted: strengthen 2-3, node 2 now wants part 1
  w[4] = 5.0f; w[5] = 5.0f;
  kway_gains(indptr, indices, w, parts, 6, 2, best, gain);
  assert(best[2] == 1 && gain[2] == 4.0f);
  // null weights = unit
  kway_gains(indptr, indices, nullptr, parts, 6, 2, best, gain);
  assert(gain[2] == 0.0f);
  std::puts("kway_gains OK");
}

int main() {
  test_aggregate_csr();
  test_kway_gains();
  test_etype_pick();
  test_hem_match();
  test_coo_to_csr();
  test_sampling();
  test_unique_compact();
  test_random_walk();
  test_block_build();
  test_block_hash_collisions();
  test_block_full_capacity();
  test_block_all_sink();
  test_block_replace_dedup();
  test_unique_compact_stress();
  std::puts("ALL C++ TESTS PASSED");
  return 0;
}
