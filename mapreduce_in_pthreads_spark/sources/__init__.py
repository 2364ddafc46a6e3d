from .tables import TABLES, load_table, load_all  # noqa: F401
from .text import read_word_per_line  # noqa: F401
