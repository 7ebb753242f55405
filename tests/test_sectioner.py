"""Metamorphic properties of the T1 chunker (SURVEY.md §5.4),
exercised through the same code path the queries use."""

from __future__ import annotations

from resume_jd_matcher_spark.operators.sectioner import _chunk_one


def chunks(text: str) -> dict[str, str]:
    return dict(_chunk_one(text))


def test_basic_sections():
    out = chunks("Summary:\nI build engines\nSkills:\npython spark")
    assert out == {"summary": "I build engines", "skills": "python spark"}


def test_preamble_dropped():
    out = chunks("John Doe\nsome address\nSummary:\nhello")
    assert out == {"summary": "hello"}


def test_headerless_text_empty():
    assert chunks("no headers anywhere in this text") == {}
    assert chunks("") == {}


def test_duplicate_header_keeps_last():
    out = chunks("Skills:\nfirst\nSKILLS:\nsecond")
    assert out == {"skills": "second"}


def test_synonym_canonicalization():
    out = chunks("Objective:\ngoal\nWork History:\njob\nAcademics:\nschool")
    assert out == {"summary": "goal", "experience": "job", "education": "school"}


def test_synonym_overwrites_canonical_twin():
    # 'objective' and 'summary' canonicalize to the same key → keep last
    out = chunks("Summary:\nfirst\nObjective:\nsecond")
    assert out == {"summary": "second"}


def test_newline_header_form():
    out = chunks("Skills\npython")
    assert out == {"skills": "python"}


def test_unknown_header_folds_into_previous_body():
    # 'Hobbies' is not in the vocabulary → not a boundary; its text
    # stays inside the preceding section's span.
    out = chunks("Skills:\npython\nHobbies:\nchess")
    assert out == {"skills": "python\nHobbies:\nchess"}


def test_permutation_invariance():
    a = "Summary:\nsss\nSkills:\nkkk\nEducation:\neee"
    b = "Education:\neee\nSummary:\nsss\nSkills:\nkkk"
    assert chunks(a) == chunks(b)


def test_bodies_stripped():
    out = chunks("Summary:\n   padded body   \nSkills:\nx")
    assert out["summary"] == "padded body"


def test_multiword_header():
    out = chunks("Professional Experience:\nbuilt things")
    assert out == {"experience": "built things"}
