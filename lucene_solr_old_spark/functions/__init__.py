from .smallfloat import float_to_byte315, byte315_to_float, NORM_TABLE, doclen_to_norm
from .porter import porter_stem
from .stopwords import ENGLISH_STOP_WORDS
from .tokenizer import standard_tokenize, analyze, analyze_terms, Token
from .htmlstrip import html_to_text
from .bm25 import Bm25Stats, idf, avgdl, K1, B
