"""HTML → text extraction (Arrow-vectorized).

The extraction contract (BASELINE.json input_hint): extracted text must be
byte-identical per url to the corpus' golden ``text`` column — asserted in
tests/test_pages.py. Extraction is versioned (EXTRACTOR_VERSION) so a
changed extractor invalidates stage manifests via the config hash rather
than silently mixing generations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.pages import extract_text_py

EXTRACTOR_VERSION = "1"


@F.pandas_udf(T.StringType())
def extract_text_udf(html: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in html:
        yield batch.map(extract_text_py)


def extracted_text(html_col: Column) -> Column:
    return extract_text_udf(html_col)
