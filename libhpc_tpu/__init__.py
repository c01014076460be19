"""libhpc_tpu — a TPU-native sparse linear-algebra / HPC-primitives framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
C++/CUDA library libHPC (see SURVEY.md) re-expressed for TPU pod slices:

- ``libhpc_tpu.sparse``   — CSR/COO/BSR/ELL containers + hierarchical block grid
  (TPU-native replacement for the reference's ``lib/sparse`` hierarchical grid,
  reference: lib/sparse/include/RootGrid.hpp:12).
- ``libhpc_tpu.ops``      — Pallas/XLA kernel primitives: tiled transpose, tiled
  exclusive scan, histogram, segmented reduce, radix sort, SpMV/SpMM/SpGEMM,
  stencils, CG solver building blocks (replacements for lib/sort,
  lib/gpu/radix_gpu, lib/hpc stencil workloads).
- ``libhpc_tpu.parallel`` — device-mesh topology, halo exchange over ICI via
  ``ppermute``, distributed SpMV/stencil (new TPU-native work; the reference is
  single-node).
- ``libhpc_tpu.runtime``  — native C++ host runtime (arena memory pool, thread
  pool, lock-free MPMC queue, parallel MatrixMarket loader) bound via ctypes
  (replacements for lib/mempool, lib/concurrency).
- ``libhpc_tpu.utils``    — Morton codes (replacement for libmorton), config
  dataclasses, profiling/roofline helpers.
"""

__version__ = "0.1.0"

from libhpc_tpu.sparse.csr import CSR  # noqa: F401
from libhpc_tpu.sparse.coo import COO  # noqa: F401
from libhpc_tpu.sparse.bsr import BSR  # noqa: F401
from libhpc_tpu.sparse.ell import ELL  # noqa: F401
