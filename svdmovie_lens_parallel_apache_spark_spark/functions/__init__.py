from .scalar import abs_err, clamp, pseudo_avg  # noqa: F401
from .hashing import hash_unit, portable_hash64, shingle_hash  # noqa: F401
from .vectors import clamped_fold, cosine_similarity, dot, l2_norm, to_double  # noqa: F401
from .text import punct_ratio, stopword_ratio, token_count, tokens, word_shingles  # noqa: F401
