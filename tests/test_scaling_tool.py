"""Unit tests for the scaling tool's HLO collective audit
(tools/scaling.py) — the regex and byte accounting that back the
"forward has zero collectives" claim in SCALING.json."""

import importlib.util
import os
import sys

SPEC = importlib.util.spec_from_file_location(
    "scaling", os.path.join(os.path.dirname(__file__), os.pardir,
                            "tools", "scaling.py"))
scaling = importlib.util.module_from_spec(SPEC)
sys.modules.setdefault("scaling", scaling)
SPEC.loader.exec_module(scaling)


HLO = """
HloModule jit_step
ENTRY %main {
  %p0 = f32[486,3]{1,0} parameter(0)
  %ar = f32[486,3]{1,0} all-reduce(%p0), replica_groups={}, to_apply=%add
  %ag = f32[8,64]{1,0} all-gather(%p0), dimensions={0}
  %cp = bf16[128]{0} collective-permute(%p0), source_target_pairs={{0,1}}
  %dot = f32[4,4]{1,0} dot(%p0, %p0), lhs_contracting_dims={1}
  ROOT %t = (f32[486,3]{1,0}) tuple(%ar)
}
"""


def test_audit_finds_and_sizes_collectives():
    found = scaling.audit_collectives(HLO)
    ops = sorted(c["op"] for c in found)
    assert ops == ["all-gather", "all-reduce", "collective-permute"]
    by_op = {c["op"]: c for c in found}
    assert by_op["all-reduce"]["bytes"] == 486 * 3 * 4
    assert by_op["all-gather"]["bytes"] == 8 * 64 * 4
    assert by_op["collective-permute"]["bytes"] == 128 * 2
    # plain dots must NOT count as collectives
    assert all("dot" not in c["op"] for c in found)


def test_audit_clean_module_is_empty():
    assert scaling.audit_collectives(
        "ENTRY %m { ROOT %x = f32[8]{0} parameter(0) }") == []
