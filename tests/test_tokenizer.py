"""Tokenizer goldens + parity with the analyzer contract (SURVEY.md §5)."""

from __future__ import annotations

import pandas as pd

from excelastic_spark.tokenizer import tokenize_pandas


def _toks(text: str) -> pd.DataFrame:
    return tokenize_pandas(pd.DataFrame({"doc_id": [0], "content": [text]}))


def test_code_like_tokens():
    out = _toks("import numpy as np\nreturn np.sum(x_1, X_1)")
    d = dict(zip(out["term"], out["tf"]))
    assert d == {"import": 1, "numpy": 1, "as": 1, "np": 2, "return": 1,
                 "sum": 1, "x_1": 2}
    assert (out["doclen"] == 9).all()


def test_lowercase_and_separators():
    out = _toks("Foo.BAR(baz) -> foo;bar")
    d = dict(zip(out["term"], out["tf"]))
    assert d == {"foo": 2, "bar": 2, "baz": 1}


def test_empty_and_symbol_only_docs():
    out = tokenize_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "content": ["", "!!! ---", "ok"]})
    )
    assert set(out["doc_id"]) == {3}
    assert list(out["term"]) == ["ok"]


def test_digits_and_underscores_kept():
    out = _toks("v2 __init__ 123 a_b_c")
    assert set(out["term"]) == {"v2", "__init__", "123", "a_b_c"}
