"""C9 license-expression combine (functions/licenses.py)."""

import pytest

from purldb_spark.functions.licenses import combine_expressions, normalize_expression


def test_normalize():
    assert normalize_expression("MIT and Apache-2.0") == "mit AND apache-2.0"
    assert (
        normalize_expression("GPL-2.0 with Classpath-Exception-2.0")
        == "gpl-2.0 WITH classpath-exception-2.0"
    )
    assert normalize_expression("( MIT or BSD-new )") == "(mit OR bsd-new)"


def test_combine_dedups_and_sorts():
    assert (
        combine_expressions(["mit", "apache-2.0", "MIT"])
        == "apache-2.0 AND mit"
    )


def test_combine_parenthesizes_compounds():
    assert (
        combine_expressions(["bsd-new OR mit", "apache-2.0"])
        == "apache-2.0 AND (bsd-new OR mit)"
    )


def test_combine_edge_cases():
    assert combine_expressions([]) is None
    assert combine_expressions(["", None]) is None
    assert combine_expressions(["mit"]) == "mit"
    assert combine_expressions(["mit", "gpl-2.0"], relation="OR") == "gpl-2.0 OR mit"
    with pytest.raises(ValueError):
        combine_expressions(["mit"], relation="XOR")


def test_operator_prefix_keys_not_split():
    # keys starting with or/and/with must not tokenize as operators
    # (oracle-bsd, android-sdk, withersworldwide are real ScanCode keys)
    from purldb_spark.functions.licenses import simplify_expression

    assert simplify_expression("mit AND oracle-bsd") == "mit AND oracle-bsd"
    assert simplify_expression("android-sdk OR android-sdk") == "android-sdk"
    assert (
        simplify_expression("gpl-2.0 WITH classpath-exception-2.0 AND orbisgis-1.0")
        == "gpl-2.0 WITH classpath-exception-2.0 AND orbisgis-1.0"
    )
