// Host-side native planner for the TPU design compiler.
//
// The reference implements its whole engine in C++
// (/root/reference/include/myfm/FMTrainer.hpp); in the TPU rebuild all
// *compute* lives on-device (JAX/XLA/Pallas), and the only host-side
// hot path is design-matrix compilation: partitioning the columns of a
// CSC design matrix into row-disjoint "colors" (see
// myfm_tpu/design.py:greedy_color).  That pass is inherently sequential
// (each column's color depends on counters updated by every previous
// column), so it cannot be vectorized with numpy — this translation
// unit provides the O(nnz) C++ implementation, loaded via ctypes.
//
// Build: g++ -O3 -shared -fPIC planner.cc -o _planner.so   (see
// myfm_tpu/_native/__init__.py, which builds lazily on first import).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Greedy row-disjoint coloring of CSC columns.
//
//   indptr  : [n_cols + 1] int64 column pointers
//   indices : [nnz]        int32 row indices
//   assign  : [n_cols]     int32 output color per column
//
// Invariant (same as the numpy fallback): c[r] is the smallest color
// safe for any future column touching row r.  A column's color is
// max(c[rows]); afterwards c[rows] is raised to color + 1, so columns
// sharing a row always land in different colors.
void myfm_greedy_color(int64_t n_rows, int64_t n_cols,
                       const int64_t* indptr, const int32_t* indices,
                       int32_t* assign) {
  std::vector<int32_t> c(static_cast<size_t>(n_rows), 0);
  for (int64_t f = 0; f < n_cols; ++f) {
    int32_t col = 0;
    const int64_t begin = indptr[f];
    const int64_t end = indptr[f + 1];
    for (int64_t p = begin; p < end; ++p) {
      col = std::max(col, c[indices[p]]);
    }
    assign[f] = col;
    const int32_t next = col + 1;
    for (int64_t p = begin; p < end; ++p) {
      int32_t& cr = c[indices[p]];
      cr = std::max(cr, next);
    }
  }
}

}  // extern "C"
