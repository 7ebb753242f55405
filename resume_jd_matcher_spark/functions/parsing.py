"""Prompt assembly and structured-output parsing (SURVEY.md §2.B
T2/T3/T4/T5) — the reference's LLM I/O contract as native expressions.

Reference sites: prompt assembly ``rag_model.py:67-79`` (sections →
``[name]\\nbody`` blocks + bullet name list + str.format); score parse
``rag_model.py:83-98`` (``SCORES:`` regex → line split on first ':' →
int(), any failure degrading the whole dict to {}); templates
``constants.py:7-114``; section vocabulary ``constants.py:116-124``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The 7-key section vocabulary (reference constants.py:116-124).
SECTION_PATTERNS: dict[str, str] = {
    "summary": r"(summary|objective|about me)",
    "experience": r"(experience|work history|professional experience)",
    "skills": r"(skills|technologies|technical skills)",
    "projects": r"(projects|portfolio)",
    "education": r"(education|academics)",
    "certifications": r"(certifications|qualifications|achievements|endorsements)",
    "strengths": r"(strengths|capabilities|abilities|merits)",
}

# Structured-scoring prompt (reference constants.py:82-114). The engine
# treats the template as data: T3 is pure string assembly.
SCORE_ALL_SECTIONS_PROMPT = """
You are a strict and concise evaluator.

You will receive:
1. A resume broken into **PRE-DEFINED sections**.
2. A job description (JD).

Your task:
- Evaluate each resume section **exactly as labeled**.
- Use **ONLY these section names** (do NOT rename or invent new ones):
{section_names_list}

- Assign a score from 0 (poor match) to 10 (perfect match) for each section's relevance to the JD.
- Output in this format ONLY:

SCORES:
<Section Name>: <score>
<Section Name>: <score>
...

DO NOT:
- Generate new sections
- Modify section names
- Provide explanation or commentary

Now evaluate:

RESUME SECTIONS:
{sections_text}

JOB DESCRIPTION:
\"\"\"{jd_text}\"\"\"
"""


def canonical_section(raw: Column | str) -> Column:
    """T2: raw header → canonical section key via full-match against the
    vocabulary (reference rag_model.py:31-35); unknown → NULL."""
    c = F.col(raw) if isinstance(raw, str) else raw
    out = F.lit(None).cast("string")
    for key, pattern in reversed(SECTION_PATTERNS.items()):
        out = F.when(
            F.lower(F.trim(c)).rlike(f"^(?:{pattern})$"), F.lit(key)
        ).otherwise(out)
    return out


def assemble_prompt(
    sections: DataFrame,
    jd_text: str,
    id_col: str = "doc_id",
    section_col: str = "section",
    body_col: str = "body",
) -> DataFrame:
    """T3: per document, join sections as ``[name]\\nbody`` blocks
    separated by blank lines, plus the ``- name`` bullet list, formatted
    into SCORE_ALL_SECTIONS_PROMPT (reference rag_model.py:67-79).

    Section order: ascending by name (deterministic under shuffle; the
    reference used dict insertion order, which is not reproducible in a
    distributed agg).

    Output: (id, prompt).
    """
    per_doc = (
        sections.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(section_col), F.col(body_col)))
            ).alias("secs")
        )
        .select(
            id_col,
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.col("secs"),
                    lambda s: F.format_string("[%s]\n%s", s[section_col], s[body_col]),
                ),
            ).alias("sections_text"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.col("secs"), lambda s: F.concat(F.lit("- "), s[section_col])
                ),
            ).alias("section_names_list"),
        )
    )
    # str.format with a literal template = three replace()s on constants.
    prompt = F.lit(SCORE_ALL_SECTIONS_PROMPT)
    prompt = F.replace(prompt, F.lit("{section_names_list}"), F.col("section_names_list"))
    prompt = F.replace(prompt, F.lit("{sections_text}"), F.col("sections_text"))
    prompt = F.replace(prompt, F.lit("{jd_text}"), F.lit(jd_text))
    return per_doc.select(F.col(id_col), prompt.alias("prompt"))


def parse_scores(
    responses: DataFrame, id_col: str = "doc_id", resp_col: str = "response"
) -> DataFrame:
    """T4: parse the ``SCORES:\\n<name>: <int>`` contract
    (reference rag_model.py:83-98) with its exact degradation
    semantics: no ``SCORES:`` header → no rows for the document;
    lines without ':' skipped; ANY non-integer score on a ':' line
    voids the WHOLE document (the reference's dict comprehension
    throws and is caught, yielding {}).

    Duplicate section lines keep the LAST occurrence (dict-comprehension
    semantics in the reference).

    Output: (id, section, score INT) for valid documents only.
    """
    body = F.regexp_extract(F.col(resp_col), r"(?s)SCORES:\s*(.*)", 1)
    lines = responses.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(body), r"\n")).alias("pos", "line"),
    ).filter(F.col("line").contains(":"))
    parsed = lines.select(
        id_col,
        "pos",
        F.trim(F.element_at(F.split(F.col("line"), ":", 2), 1)).alias("section"),
        F.expr(
            "try_cast(trim(element_at(split(line, ':', 2), 2)) AS INT)"
        ).alias("score"),
    )
    validity = parsed.groupBy(id_col).agg(
        (F.count(F.when(F.col("score").isNull(), 1)) == 0).alias("all_ok")
    )
    # keep-last per (doc, section) = max line position wins
    last = parsed.groupBy(id_col, "section").agg(
        F.max(F.struct("pos", "score")).alias("best")
    )
    return (
        last.join(validity, id_col)
        .filter(F.col("all_ok"))
        .select(id_col, "section", F.col("best.score").alias("score"))
    )


def normalize_distance_score(dist: Column) -> Column:
    """T5: ``round(10 * 1/(1+d), 2)`` (reference rag_model_mass.py:13-15)."""
    return F.round(F.lit(10.0) / (F.lit(1.0) + dist), 2)


def mean_score(
    scores: DataFrame, id_col: str = "doc_id", score_col: str = "score"
) -> DataFrame:
    """A1: final score = round(mean(section scores), 2) (reference
    app.py:94). Empty group → no row (the reference raised ValueError;
    at scale absence is the signal).

    Output: (id, final_score DOUBLE)."""
    return scores.groupBy(id_col).agg(
        F.round(F.avg(score_col), 2).alias("final_score")
    )
