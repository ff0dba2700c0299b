"""postgres_word2vec_tpu — a TPU-native word-embedding search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of FREDDY
(guenthermi/postgres-word2vec, SIGMOD'18): cosine/L2 exact k-NN, product
quantization (PQ) with asymmetric distance computation, IVFADC inverted-file
search, inverted multi-index PQ (IVPQ) batched kNN-joins with
statistics-driven adaptive probing, post-verification re-ranking, analogy,
grouping, k-means clustering, tokenization, and online index maintenance.

Where the reference runs C UDF kernels inside a Postgres backend and moves
data through SPI queries per call (see /root/reference/freddy_extension/),
this framework keeps all index state resident in device HBM as packed arrays
and expresses every hot loop as MXU-shaped matmuls or Pallas kernels.
"""

from postgres_word2vec_tpu.store import VectorStore
from postgres_word2vec_tpu.models.exact import ExactIndex
from postgres_word2vec_tpu.models.pq import PQIndex, PQCodebook
from postgres_word2vec_tpu.models.ivfadc import IVFADCIndex
from postgres_word2vec_tpu.models.ivpq import IVPQIndex
from postgres_word2vec_tpu.api import Freddy, RuntimeParams

__version__ = "0.1.0"

__all__ = [
    "VectorStore",
    "ExactIndex",
    "PQIndex",
    "PQCodebook",
    "IVFADCIndex",
    "IVPQIndex",
    "Freddy",
    "RuntimeParams",
    "__version__",
]
