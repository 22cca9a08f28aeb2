// Unit tests for the native host ops (reference tests/cpp/*.cc gtest suite;
// assert-based here to avoid vendoring gtest). Run via `make test`.
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
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

int main() {
  test_coo_to_csr();
  test_sampling();
  test_unique_compact();
  test_random_walk();
  test_block_build();
  std::puts("ALL C++ TESTS PASSED");
  return 0;
}
