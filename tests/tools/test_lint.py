"""Meta-tests for the lint gate (tools/lint.py): the CI pipeline trusts
it to catch the bug classes it exists for, so pin them."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).parents[2]


def _lint(tmp_path, source):
    f = tmp_path / "mod.py"
    f.write_text(source)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py"), str(f)],
        capture_output=True,
        text=True,
    )
    return out.returncode, out.stdout


def test_undefined_name_in_annotation(tmp_path):
    """The exact bug class that shipped: Optional used in annotations
    under `from __future__ import annotations` without an import."""
    rc, out = _lint(
        tmp_path,
        "from __future__ import annotations\n"
        "def f(x: Optional[int] = None):\n"
        "    return x\n",
    )
    assert rc == 1
    assert "undefined name 'Optional'" in out


def test_undefined_name_in_body(tmp_path):
    rc, out = _lint(tmp_path, "def f():\n    return missing_thing\n")
    assert rc == 1
    assert "undefined name 'missing_thing'" in out


def test_unused_import(tmp_path):
    rc, out = _lint(tmp_path, "import os\nX = 1\n")
    assert rc == 1
    assert "unused import 'os'" in out


def test_keyword_argument_counts_as_use(tmp_path):
    """Round-4 regression: keyword-argument values were not visited, so
    imports used only there were flagged (and undefined names missed)."""
    rc, out = _lint(
        tmp_path,
        "import math\n"
        "def f(x):\n"
        "    return sorted(x, key=math.sin)\n",
    )
    assert rc == 0, out


def test_clean_file_passes(tmp_path):
    rc, out = _lint(
        tmp_path,
        "import os\n\n"
        "def f():\n"
        "    return os.getcwd()\n",
    )
    assert rc == 0, out


def test_repo_is_lint_clean():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout
