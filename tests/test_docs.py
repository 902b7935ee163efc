"""Doc-hygiene checks: counts advertised in README stay derived from the
actual registry, and the driver-gate rotation set stays consistent."""

import os
import re

import __spark_entry__ as E
from gdal_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_registry_count_current():
    text = open(os.path.join(REPO, "README.md")).read()
    advertised = {int(m) for m in re.findall(r"(\d+)-query registry", text)}
    advertised |= {int(m) for m in re.findall(r"registry \((\d+) entries", text)}
    assert advertised, "README no longer states the registry size"
    assert advertised == {len(Q.QUERIES)}, (
        f"README advertises {sorted(advertised)} but registry has "
        f"{len(Q.QUERIES)} entries"
    )


def test_every_query_has_oracle():
    assert set(Q.ORACLES) == set(Q.QUERIES)


def test_gated_rounds_subset_of_registry():
    unknown = E._GATED_ROUNDS - set(Q.QUERIES)
    assert not unknown, f"_GATED_ROUNDS names unregistered queries: {unknown}"
    # rotation must leave never-gated keys first
    order = list(E.queries())
    n_ungated = len(order) - len(E._GATED_ROUNDS)
    assert all(k not in E._GATED_ROUNDS for k in order[:n_ungated])
    assert all(k in E._GATED_ROUNDS for k in order[n_ungated:])
