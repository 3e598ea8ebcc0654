"""Guard the driver correctness window (VERDICT r02 item 1/9).

The driver evaluates only the first ``gate.DRIVER_WINDOW`` entries of
``__spark_entry__.queries()``.  Round 2 silently left 27 gates outside the
window; these checks make that impossible to repeat:

  * every _PRIORITY name must exist in GATE (no typos / stale names),
  * gates that have NEVER had a green driver row must sit inside the window,
  * every gate has either a SQL oracle or a documented rows-only status,
  * ordered_gate() is a permutation of GATE (nothing dropped).
"""

from __future__ import annotations

import json
import os

from lucene_solr_old_spark import gate

# gates green in CORRECTNESS_r01 or r02 (driver history); anything outside
# this set has never been driver-certified and MUST be inside the window.
_HISTORICALLY_GREEN = set()
for _f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
           "CORRECTNESS_r03.json", "CORRECTNESS_r04.json"):
    _p = os.path.join(os.path.dirname(os.path.dirname(__file__)), _f)
    if os.path.exists(_p):
        with open(_p) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") or row.get("rows_match"):
                    _HISTORICALLY_GREEN.add(name)


def test_priority_names_exist():
    missing = [n for n in gate._PRIORITY if n not in gate.GATE]
    assert not missing, f"stale _PRIORITY names: {missing}"


def test_priority_no_duplicates():
    assert len(gate._PRIORITY) == len(set(gate._PRIORITY))


def test_never_certified_gates_inside_window():
    # never-certified gates must be inside the driver's 50-slot window OR
    # in the documented _PRIORITY overflow (positions 51+) — i.e. first in
    # line for next round's rotation.  More than 50 never-certified gates
    # cannot all be certified in one round by construction.
    ordered = list(gate.ordered_gate())
    allowed = set(ordered[: gate.DRIVER_WINDOW]) | set(
        gate._PRIORITY[gate.DRIVER_WINDOW:])
    never = [n for n in gate.GATE
             if n not in _HISTORICALLY_GREEN and n not in allowed]
    assert not never, (
        f"gates with no driver-green history are outside the first "
        f"{gate.DRIVER_WINDOW} queries() entries and not in the "
        f"documented overflow: {never}")


def test_ordered_gate_is_permutation():
    assert set(gate.ordered_gate()) == set(gate.GATE)
    assert len(gate.ordered_gate()) == len(gate.GATE)


def test_every_gate_has_oracle_or_is_documented():
    # rows-only gates (no SQL-expressible oracle) must be deliberate;
    # currently every registered gate carries a DuckDB oracle.
    no_oracle = [n for n, (_fn, sql) in gate.GATE.items() if sql is None]
    assert no_oracle == [], f"gates without oracle SQL: {no_oracle}"
