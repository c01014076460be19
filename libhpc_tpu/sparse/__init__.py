from libhpc_tpu.sparse.coo import COO  # noqa: F401
from libhpc_tpu.sparse.csr import CSR  # noqa: F401
from libhpc_tpu.sparse.bsr import BSR  # noqa: F401
from libhpc_tpu.sparse.ell import ELL  # noqa: F401
from libhpc_tpu.sparse.dia import DIA  # noqa: F401
from libhpc_tpu.sparse.hybrid import BandedHybrid  # noqa: F401
from libhpc_tpu.sparse.grid import BlockGrid, NestedGrid  # noqa: F401
from libhpc_tpu.sparse.bell import BELL  # noqa: F401
from libhpc_tpu.sparse.sbell import SBELL  # noqa: F401
from libhpc_tpu.sparse.auto import auto_format  # noqa: F401
