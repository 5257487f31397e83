"""Query parser (SURVEY.md Q1; semantics frozen in FIXTURES.md §3.3).

Grammar (xsearch-style free-text term bag, plus the pinned extensions):

  * bare terms           -> implicit AND over distinct analyzed terms
  * ``OR`` keyword       -> switches the connective to union
  * ``lang:X`` prefix    -> field filter on the ``lang`` column
  * ``-term``            -> NOT: exclude docs containing term

Driver-side only — a query is one string; nothing to distribute.
Duplicate terms count once (FIXTURES.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from xsearch_spark.functions.tokenize import tokenize_query


@dataclass(frozen=True)
class ParsedQuery:
    terms: tuple[str, ...]  # distinct, first-occurrence order
    connective: str = "AND"  # "AND" | "OR"
    lang: str | None = None
    exclude: tuple[str, ...] = field(default_factory=tuple)


def parse(query: str, variant: str = "base") -> ParsedQuery:
    connective = "AND"
    lang: str | None = None
    include: list[str] = []
    exclude: list[str] = []
    for token in query.split():
        if token == "OR":
            connective = "OR"
            continue
        if token.startswith("lang:"):
            lang = token[len("lang:") :]
            continue
        neg = token.startswith("-")
        body = token[1:] if neg else token
        # analyze with the same chain as the index side (A3)
        for term in tokenize_query(body, variant):
            target = exclude if neg else include
            if term not in target:
                target.append(term)
    return ParsedQuery(
        terms=tuple(include), connective=connective, lang=lang, exclude=tuple(exclude)
    )
