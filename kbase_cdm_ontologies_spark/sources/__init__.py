from .corpus import CorpusSpec, generate_corpus  # noqa: F401
from .tables import read_table, write_table  # noqa: F401
