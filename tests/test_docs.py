"""docs/API.md drift guard: every public function/class in the package must
appear (by name) in the API reference, and every documented CLI flag must
exist in its parser.  Keeps the user-facing surface map honest as modules
grow — a new public symbol without a doc entry fails here."""
import ast
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "opengpc_tpu")
DOC = os.path.join(REPO, "docs", "API.md")


def _public_symbols():
    """(module_path, name) for every top-level public def/class in the
    package, excluding CLI modules (documented as commands, not symbols)."""
    out = []
    for root, dirs, files in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        if os.path.basename(root) == "cli":
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            tree = ast.parse(open(path).read())
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.ClassDef)) \
                        and not node.name.startswith("_"):
                    out.append((os.path.relpath(path, REPO), node.name))
    return out


def test_every_public_symbol_documented():
    doc = open(DOC).read()
    missing = [f"{p}::{n}" for p, n in _public_symbols() if n not in doc]
    assert not missing, (
        "public symbols missing from docs/API.md (add an entry or prefix "
        f"with _ if internal): {missing}")


def test_documented_cli_flags_exist():
    """Every --flag named in the CLI table must be a real argparse option
    of the corresponding command (catches renamed/removed flags)."""
    import re

    from opengpc_tpu.cli import extract, sparsematch, train

    doc = open(DOC).read()
    table = doc.split("## Command-line tools")[1].split("##")[0]

    def flags_of(module):
        src = ast.parse(open(module.__file__).read())
        found = set()
        for node in ast.walk(src):
            if isinstance(node, ast.Call) and \
                    getattr(node.func, "attr", "") == "add_argument":
                for a in node.args:
                    if isinstance(a, ast.Constant) and \
                            str(a.value).startswith("--"):
                        found.add(a.value)
        return found

    rows = {"opengpc-extract": flags_of(extract),
            "opengpc-train": flags_of(train),
            "opengpc-sparsematch": flags_of(sparsematch)}
    for line in table.splitlines():
        for cmd, real in rows.items():
            if f"`{cmd} " in line or f"`{cmd}`" in line:
                documented = set(re.findall(r"--[a-z][a-z0-9-]*", line))
                unknown = documented - real
                assert not unknown, (cmd, sorted(unknown), sorted(real))


def test_doc_contract_names_match_cli_choices():
    """The --contract value list in the doc matches the parser's choices."""
    import re

    from opengpc_tpu.cli import sparsematch

    doc = open(DOC).read()
    m = re.search(r"--contract ([a-z|\\-]+)`", doc)
    assert m, "no --contract value list in docs/API.md"
    documented = set(m.group(1).replace("\\", "").split("|"))

    src = ast.parse(open(sparsematch.__file__).read())
    choices = None
    for node in ast.walk(src):
        if isinstance(node, ast.Call) and \
                getattr(node.func, "attr", "") == "add_argument" and \
                any(isinstance(a, ast.Constant) and a.value == "--contract"
                    for a in node.args):
            for kw in node.keywords:
                if kw.arg == "choices":
                    choices = {c.value for c in kw.value.elts}
    assert choices is not None
    assert documented == choices, (documented, choices)


def test_version_single_source():
    """opengpc_tpu.__version__ must match pyproject.toml (the two drifted
    0.4.0 vs 0.5.0 once) and every CLI must report it via --version."""
    import re

    import pytest

    import opengpc_tpu

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pyproject = open(os.path.join(repo, "pyproject.toml")).read()
    m = re.search(r'^version = "([^"]+)"', pyproject, re.M)
    assert m and m.group(1) == opengpc_tpu.__version__
    from opengpc_tpu.cli.aot import main as aot_main
    from opengpc_tpu.cli.extract import main as ex_main
    from opengpc_tpu.cli.sparsematch import main as sm_main
    from opengpc_tpu.cli.train import main as tr_main
    for main in (sm_main, ex_main, tr_main, aot_main):
        with pytest.raises(SystemExit) as e:
            main(["--version"])
        assert e.value.code == 0
