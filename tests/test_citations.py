"""Reference-citation hygiene: docstrings are the parity contract.

Every behavioral contract in the package cites a reference file (often
file:line).  This scans all package sources for reference-shaped paths
and asserts each cited FILE exists in /root/reference — catching doc rot
like the round-2 `pallas/pairwise_kernel.py` stale citation (line
numbers are not checked; they drift with unrelated edits and the parity
tests pin the actual behavior).
"""

import re
from pathlib import Path

import pytest

REF = Path("/root/reference")
PKG = Path(__file__).resolve().parent.parent / "pointcloudattack_tpu"

# reference-rooted path prefixes (see SURVEY.md §1 layout)
_CITE = re.compile(
    r"\b((?:attack|model|dataset|defense|pointnet|misc|scripts)/"
    r"[\w\-./]+\.(?:py|cpp|txt|pth))\b"
)
# our own modules that shadow reference-style prefixes
_OWN = re.compile(r"\b(?:pointcloudattack_tpu|tests)/")


@pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")
def test_cited_reference_files_exist():
    missing = []
    for src in sorted(PKG.rglob("*.py")):
        text = src.read_text()
        for m in _CITE.finditer(text):
            cited = m.group(1)
            # skip matches that are clearly our package paths
            start = max(0, m.start() - 30)
            if _OWN.search(text[start : m.start()]):
                continue
            # a path that exists in THIS repo is a self-reference
            # (e.g. "scripts/tpu_parity_fused.py"), not a reference
            # citation — "scripts/" is a prefix both trees use
            if (PKG.parent / cited).exists():
                continue
            if not (REF / cited).exists():
                missing.append(f"{src.relative_to(PKG.parent)}: {cited}")
    assert not missing, "stale reference citations:\n" + "\n".join(missing)


def test_top_level_root_files_cited_exist():
    """Top-level reference citations (train.py, test.py, readbnt.py,
    Test_AdvData.py, get_dataset_csv.py) are common enough to check
    explicitly."""
    if not REF.exists():
        pytest.skip("reference checkout absent")
    for name in (
        "train.py",
        "test.py",
        "readbnt.py",
        "Test_AdvData.py",
        "get_dataset_csv.py",
    ):
        assert (REF / name).exists(), name
