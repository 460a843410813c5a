"""Prompt builders + the shared token heuristics the stub relies on.

The reference's entire LLM interface is ``llm.predict(prompt) -> str``
(Semantic-OLAP/Agents/Components/Operaters.py:69,343,388,423,487).
Our prompts mirror the reference's operator semantics — Yes/No row
judge (Operaters.py:54-67), per-row mapper (Operaters.py:327-342),
unique-value summarizer (Operaters.py:407-422), pairwise relevance
judge (Operaters.py:475-486), enum keep-list (Operaters.py:261-277),
per-template regex plan (Operaters.py:132-175) — with one addition: a
machine-readable first line ``### task: <name>`` so the deterministic
StubLLM can dispatch without NL understanding.  A real model simply
reads it as context.

Every builder is paired with a parser the stub uses; keeping both in
this module is what makes stub behavior exactly reproducible (the
test strategy of SURVEY.md §5 item 2).
"""

from __future__ import annotations

import json
import re
from typing import Sequence

CONTENT_SEP = "<<<CONTENT>>>"

# Minimal fixed stopword list used when extracting "significant"
# tokens from an NL condition. Deliberately small and frozen — stub
# determinism matters more than linguistic quality.
STOPWORDS = frozenset(
    """a an and are about all any as at be but by can for from had has have
    how in is it its not of on or rows row related that the their them then
    there these they this to was were what when where which who whose why
    will with find show give list most""".split()
)


def condition_tokens(condition: str) -> list[str]:
    """Significant lowercase tokens of an NL condition, in order."""
    toks = re.findall(r"[a-z0-9_]+", condition.lower())
    seen, out = set(), []
    for t in toks:
        if len(t) >= 3 and t not in STOPWORDS and t not in seen:
            seen.add(t)
            out.append(t)
    return out


def vocab_of(description: str) -> list[str]:
    """Parse an enumerated label vocabulary out of an instruction.

    Convention: ``... one of: a, b, c`` (case-insensitive). Returns
    [] when the instruction doesn't enumerate labels.
    """
    m = re.search(r"one of:\s*([^.;\n]+)", description, flags=re.I)
    if not m:
        return []
    return [v.strip() for v in m.group(1).split(",") if v.strip()]


def row_content(col_names: Sequence[str], values: Sequence) -> str:
    """The reference feeds rows as ``col: value`` lines (Operaters.py:347)."""
    return "\n".join(
        f"{c}: {'' if v is None else v}" for c, v in zip(col_names, values)
    )


# ---- builders ----------------------------------------------------------


def filter_prompt(condition: str, content: str) -> str:
    return (
        "### task: sem_filter\n"
        "Decide whether the content satisfies the condition. "
        "Answer exactly Yes or No.\n"
        f"Condition: {condition}\n"
        f"{CONTENT_SEP}\n{content}"
    )


def map_prompt(keyword: str, map_description: str, content: str) -> str:
    return (
        "### task: sem_map\n"
        f'Generate the value of a new column "{keyword}" for this row. '
        "Reply with the value only; reply NA if it cannot be derived.\n"
        f"Instruction: {map_description}\n"
        f"{CONTENT_SEP}\n{content}"
    )


def group_classify_prompt(
    keyword: str, group_description: str, tags: Sequence[str], content: str
) -> str:
    return (
        "### task: sem_group_classify\n"
        f'Assign one group tag for column "{keyword}". '
        "Reply with the tag only.\n"
        f"Instruction: {group_description}\n"
        f"Tags: {json.dumps(list(tags))}\n"
        f"{CONTENT_SEP}\n{content}"
    )


def group_induce_prompt(
    keyword: str, group_description: str, samples: Sequence[str]
) -> str:
    return (
        "### task: sem_group_induce\n"
        "Propose a small set of 1-3 word group tags (lowercase, "
        "underscores) covering the sample values. Reply with a JSON "
        "array of tags.\n"
        f"Instruction: {group_description}\n"
        f"Column: {keyword}\n"
        f"{CONTENT_SEP}\n{json.dumps(list(samples))}"
    )


def reduce_prompt(columns: Sequence[str], values: Sequence[str]) -> str:
    return (
        "### task: sem_reduce\n"
        "Summarize the following unique values into one short phrase.\n"
        f"Columns: {json.dumps(list(columns))}\n"
        f"{CONTENT_SEP}\n{json.dumps(list(values))}"
    )


def topk_pair_prompt(query: str, content_a: str, content_b: str) -> str:
    return (
        "### task: sem_topk_pair\n"
        "Which content is more relevant to the query? Answer exactly "
        "A or B.\n"
        f"Query: {query}\n"
        f"<<<A>>>\n{content_a}\n"
        f"<<<B>>>\n{content_b}"
    )


def enum_prompt(condition: str, values: Sequence[str]) -> str:
    return (
        "### task: filter_enum\n"
        "Given the distinct values of a column, return the JSON array "
        "of values that satisfy the condition.\n"
        f"Condition: {condition}\n"
        f"{CONTENT_SEP}\n{json.dumps(list(values))}"
    )


def pattern_prompt(condition: str, template: str, examples: Sequence[str]) -> str:
    return (
        "### task: filter_pattern\n"
        "Values of a column share the digit-masked template below "
        "(<*> marks digit runs). Derive a regex with one capture "
        "group per digit run and a numeric filter plan implementing "
        "the condition. Reply with JSON "
        '{"regex": str, "conditions": [{"group": int, "operator": '
        'str, "threshold": float}], "logic": "and"|"or"}.\n'
        f"Condition: {condition}\n"
        f"Template: {template}\n"
        f"{CONTENT_SEP}\n{json.dumps(list(examples))}"
    )


# ---- parsing helpers (used by StubLLM) ---------------------------------


def split_sections(prompt: str) -> tuple[dict[str, str], str]:
    """Return ({header-key: value}, content-after-CONTENT_SEP)."""
    head, _, content = prompt.partition(CONTENT_SEP + "\n")
    fields: dict[str, str] = {}
    for line in head.splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            fields.setdefault(k.strip().lower(), v.strip())
    return fields, content


def task_of(prompt: str) -> str:
    first = prompt.split("\n", 1)[0]
    return first.replace("### task:", "").strip()
