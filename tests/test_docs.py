"""Vendored docs build check.

Sphinx is not installed in this image (the CI `docs` job runs the real
`make -C docs html -W`); this test validates everything the build would
catch that does not require sphinx itself: conf.py executes with the
expected settings, the toctree resolves, local links point at real files,
fenced code blocks are balanced, every ```python block parses, and the
example scripts and API modules the docs reference actually exist.
"""
import ast
import importlib
import pathlib
import re

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"
ROOT = DOCS.parent


def test_conf_py_executes_with_expected_settings():
    ns = {}
    exec(compile((DOCS / "conf.py").read_text(), "conf.py", "exec"), ns)
    assert ns["project"] == "rectipy_tpu"
    assert "myst_parser" in ns["extensions"]
    assert ns["master_doc"] == "index"
    assert ns["source_suffix"][".md"] == "markdown"


def test_toctree_entries_resolve():
    text = (DOCS / "index.md").read_text()
    m = re.search(r"```\{toctree\}\n(.*?)```", text, re.S)
    assert m, "index.md must contain a toctree"
    entries = [ln.strip() for ln in m.group(1).splitlines()
               if ln.strip() and not ln.strip().startswith(":")]
    assert entries, "toctree is empty"
    for e in entries:
        assert (DOCS / f"{e}.md").exists(), f"toctree entry {e!r} has no {e}.md"
    # every non-index page is reachable from the toctree
    pages = {p.stem for p in DOCS.glob("*.md")} - {"index"}
    assert pages == set(entries), f"pages not in toctree: {pages - set(entries)}"


def test_local_links_resolve():
    for page in DOCS.glob("*.md"):
        text = page.read_text()
        # strip fenced blocks (code may contain bracket syntax)
        text = re.sub(r"```.*?```", "", text, flags=re.S)
        for label, target in re.findall(r"\[([^\]]+)\]\(([^)]+)\)", text):
            if target.startswith(("http://", "https://", "#", "mailto:")):
                continue
            target = target.split("#")[0]
            if not target:
                continue
            assert (DOCS / target).exists() or (ROOT / target).exists(), \
                f"{page.name}: broken local link [{label}]({target})"


def test_code_fences_balanced_and_python_blocks_parse():
    for page in DOCS.glob("*.md"):
        lines = page.read_text().splitlines()
        fences = [ln for ln in lines if ln.strip().startswith("```")]
        assert len(fences) % 2 == 0, f"{page.name}: unbalanced code fences"
        for i, block in enumerate(
                re.findall(r"```python\n(.*?)```", page.read_text(), re.S)):
            try:
                ast.parse(block)
            except SyntaxError as e:
                raise AssertionError(
                    f"{page.name} python block {i} does not parse: {e}")


def test_referenced_examples_and_modules_exist():
    text = (DOCS / "index.md").read_text()
    for script in re.findall(r"`(examples/[\w./]+\.py)`", text):
        assert (ROOT / script).exists(), f"index.md references missing {script}"
    api = (DOCS / "api.md").read_text()
    for mod in set(re.findall(r"`(rectipy_tpu(?:\.\w+)+)`", api)):
        parts = mod.split(".")
        # try as module, else as attribute of the parent module
        try:
            importlib.import_module(mod)
            continue
        except ImportError:
            pass
        parent = importlib.import_module(".".join(parts[:-1]))
        assert hasattr(parent, parts[-1]), f"api.md references missing {mod}"


def test_makefile_has_html_target():
    mk = (DOCS / "Makefile").read_text()
    assert re.search(r"^html:", mk, re.M)


def _heading_slugs(text):
    """Myst/GitHub-style slugs for every markdown heading (lowercase,
    punctuation stripped, spaces -> dashes)."""
    slugs = set()
    for m in re.finditer(r"^#+\s+(.+)$", re.sub(r"```.*?```", "", text,
                                                flags=re.S), re.M):
        t = m.group(1).strip().lower()
        t = re.sub(r"[^\w\s-]", "", t)
        slugs.add(re.sub(r"[\s_]+", "-", t).strip("-"))
    return slugs


def test_anchor_links_and_myst_roles_resolve():
    """What `sphinx -W` (myst) would flag and the link check above misses:
    in-page / cross-page `#anchor` fragments must match a real heading slug,
    and any `{ref}`/`{doc}` myst role must resolve.  (The gallery currently
    uses neither -- this guards future usage from silent breakage.)"""
    slugs = {p.name: _heading_slugs(p.read_text()) for p in DOCS.glob("*.md")}
    for page in DOCS.glob("*.md"):
        text = re.sub(r"```.*?```", "", page.read_text(), flags=re.S)
        for label, target in re.findall(r"\[([^\]]+)\]\(([^)]+)\)", text):
            if target.startswith(("http://", "https://", "mailto:")):
                continue
            if "#" not in target:
                continue
            path, frag = target.split("#", 1)
            tgt_page = page.name if not path else pathlib.Path(path).name
            assert tgt_page in slugs, \
                f"{page.name}: anchor link to unknown page {target!r}"
            assert frag in slugs[tgt_page], \
                f"{page.name}: [{label}]({target}) anchor {frag!r} not a " \
                f"heading of {tgt_page} (have {sorted(slugs[tgt_page])})"
        for role, target in re.findall(r"\{(ref|doc)\}`([^`]+)`", text):
            target = target.split("<")[-1].rstrip(">")
            if role == "doc":
                assert (DOCS / f"{target}.md").exists(), \
                    f"{page.name}: {{doc}}`{target}` has no {target}.md"
            else:
                found = any(target in s for s in slugs.values())
                assert found, f"{page.name}: {{ref}}`{target}` resolves nowhere"
