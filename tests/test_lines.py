"""Line-level dedup (pipeline/lines.py): hand-built corpora covering
both policies, exemption, within-doc-only repeats, order preservation,
and full-document removal."""

from __future__ import annotations

from cminer_spark.pipeline.lines import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _result(df):
    return {
        r.doc_id: (r.text_clean, r.n_lines, r.n_lines_kept)
        for r in df.collect()
    }


CORPUS = [
    (0, "menu bar\nunique zero\nfooter text"),
    (1, "menu bar\nunique one\nfooter text"),
    (2, "unique two\nrepeat me\nrepeat me\nrepeat me"),
    (3, "menu bar\nfooter text"),
]


def test_global_removes_cross_doc_lines(spark):
    out = _result(line_dedup(_docs(spark, CORPUS)))
    # "menu bar" (docs 0,1,3) and "footer text" (docs 0,1,3) vanish
    # everywhere; "repeat me" repeats only inside doc 2 -> kept.
    assert out[0] == ("unique zero", 3, 1)
    assert out[1] == ("unique one", 3, 1)
    assert out[2] == ("unique two\nrepeat me\nrepeat me\nrepeat me", 4, 4)
    assert out[3] == ("", 2, 0)  # doc fully boilerplate -> empty row kept


def test_keep_first_keeps_smallest_doc_pos(spark):
    out = _result(line_dedup(_docs(spark, CORPUS), keep_first=True))
    # first "menu bar" = (0,0), first "footer text" = (0,2)
    assert out[0] == ("menu bar\nunique zero\nfooter text", 3, 3)
    assert out[1] == ("unique one", 3, 1)
    assert out[2] == ("unique two\nrepeat me\nrepeat me\nrepeat me", 4, 4)
    assert out[3] == ("", 2, 0)


def test_min_dup_docs_threshold(spark):
    rows = [(0, "x\ny"), (1, "x\nz"), (2, "x\nw")]
    out = _result(line_dedup(_docs(spark, rows), min_dup_docs=4))
    assert all(v[1] == v[2] for v in out.values())  # nothing removed
    out3 = _result(line_dedup(_docs(spark, rows), min_dup_docs=3))
    assert out3[0] == ("y", 2, 1)  # x is in 3 docs -> removed


def test_short_lines_exempt(spark):
    rows = [(0, "a\n\nlong shared line"), (1, "a\n\nlong shared line")]
    out = _result(
        line_dedup(_docs(spark, rows), min_line_chars=2)
    )
    # "" and "a" are under min_line_chars -> exempt even though shared;
    # the long line is removed from both docs.
    assert out[0] == ("a\n", 3, 2)
    assert out[1] == ("a\n", 3, 2)


def test_normalized_key_trims_padding(spark):
    rows = [(0, "  padded  \nkeep zero"), (1, "padded\nkeep one")]
    out = _result(line_dedup(_docs(spark, rows)))
    # keys are md5(trim(line)): "  padded  " == "padded" -> both removed
    assert out[0] == ("keep zero", 2, 1)
    assert out[1] == ("keep one", 2, 1)


def test_min_dup_docs_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        line_dedup(_docs(spark, CORPUS), min_dup_docs=1)
