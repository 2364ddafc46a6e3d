from .normalize import normalize_word, tokenize_with_pos  # noqa: F401
from .numeric import dsum, davg  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
