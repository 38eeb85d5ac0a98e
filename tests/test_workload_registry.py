"""Pin the workload registry counts that README.md states in prose, so
the documented numbers cannot drift from the registry (VERDICT r3
housekeeping item: generate/assert the count instead of hand-editing)."""

import os
import re

from ksql_streams_from_schema_converter_spark.workload import WORKLOAD

_README = os.path.join(os.path.dirname(__file__), "..", "README.md")
#: r5: empty — the ANN family moved from rows-only to in-query recall
#: verdicts hash-gated against the planted-truth corpus (VERDICT r4 #1)
_NO_ORACLE: set[str] = set()


def test_registry_counts_match_readme_prose():
    total = len(WORKLOAD)
    with_oracle = sum(1 for _, sql in WORKLOAD.values() if sql is not None)
    with open(_README) as fh:
        readme = fh.read()
    m = re.search(r"(\d+) of (\d+) are\s*\nvalue-hash-checked", readme)
    assert m, "README no longer states the oracle coverage counts"
    assert (int(m.group(1)), int(m.group(2))) == (with_oracle, total), (
        f"README says {m.group(1)}/{m.group(2)}, registry has "
        f"{with_oracle}/{total} — update README.md"
    )


def test_every_query_has_an_oracle():
    assert {n for n, (_, sql) in WORKLOAD.items() if sql is None} == _NO_ORACLE
