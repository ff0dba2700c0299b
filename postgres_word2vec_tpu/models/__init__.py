"""Index model families: exact, PQ, IVFADC, IVPQ."""

from postgres_word2vec_tpu.models.exact import ExactIndex
from postgres_word2vec_tpu.models.pq import PQIndex, PQCodebook
from postgres_word2vec_tpu.models.ivfadc import IVFADCIndex
from postgres_word2vec_tpu.models.ivpq import IVPQIndex

__all__ = ["ExactIndex", "PQIndex", "PQCodebook", "IVFADCIndex", "IVPQIndex"]
