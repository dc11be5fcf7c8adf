"""Python UDTF (Spark 4): one input row → N output rows with arbitrary
Python logic — the table-function escape hatch when `explode` over a
built-in array expression can't express the expansion.

Kept as a demonstration of the API surface; the engine's hot paths use
explode/posexplode (JVM-side) instead, per the UDFs-are-the-slow-path rule.
"""

from pyspark.sql.functions import udtf

STOPWORDS = {"the", "a", "of", "and", "to", "in"}


@udtf(returnType="token: string, pos: int, is_stopword: boolean")
class TokenizeUDTF:
    """Tokenize a line with position + stopword flag."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        for pos, tok in enumerate(text.split()):
            yield tok, pos, tok in STOPWORDS
