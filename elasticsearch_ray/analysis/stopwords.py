"""Stopword sets. Reference: Lucene ``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET``
(the 33-word classic list), used by ES's ``stop`` filter default ``_english_``
(``modules/analysis-common/.../CommonAnalysisPlugin.java`` stop filter entry).
"""

ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

STOPWORDS = {"_english_": ENGLISH_STOP_WORDS, "_none_": frozenset()}
