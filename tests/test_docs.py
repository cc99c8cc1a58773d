"""Docs integrity: internal links resolve and the API reference only names
symbols that actually exist."""

import pathlib
import re

DOC = pathlib.Path(__file__).resolve().parent.parent / "doc"


def test_internal_links_resolve():
    assert (DOC / "index.md").exists()
    for page in DOC.glob("*.md"):
        for m in re.finditer(r"\]\(([\w\-]+\.md)(?:#[\w\-]+)?\)",
                             page.read_text()):
            target = DOC / m.group(1)
            assert target.exists(), f"{page.name}: broken link {m.group(1)}"


def _api_names_in_docs():
    """Identifiers the API page claims to export: ONLY backtick-quoted
    names (no prose scanning; underscored prose can't false-positive)."""
    text = (DOC / "python-api.md").read_text()
    names = set()
    for m in re.finditer(r"`([A-Za-z_][A-Za-z0-9_.]*)(?:\(\))?`", text):
        n = m.group(1).split(".")[-1]
        if "_" in n and not n.endswith("_"):   # skip glob shorthand `..._*`
            names.add(n)
    return names


def test_api_reference_names_exist():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import mrcal_tpu
    candidates = _api_names_in_docs() - {
        "get_gradients", "camera_info", "jax_sharding", "mrcal_tpu",
        "optimization_inputs", "out_of"}
    have = set(dir(mrcal_tpu))
    from mrcal_tpu import parallel
    have |= set(dir(parallel))
    have |= set(dir(mrcal_tpu.CHOLMOD_factorization))    # methods named too
    missing = sorted(n for n in candidates if n not in have)
    assert not missing, f"python-api.md names missing from package: {missing}"


def test_package_names_in_api_reference():
    """The reverse direction: every public callable exported at the package
    top level must be mentioned in the API page (backtick-quoted), so new
    API can't silently skip the docs."""
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import mrcal_tpu
    documented = _api_names_in_docs()
    text = (DOC / "python-api.md").read_text()
    public = {n for n in dir(mrcal_tpu)
              if not n.startswith("_") and "_" in n
              and callable(getattr(mrcal_tpu, n))}
    # names covered by a documented glob shorthand like `state_index_*`
    globs = [g[:-1] for g in re.findall(r"`([A-Za-z0-9_]+_)\*`", text)]
    missing = sorted(
        n for n in public
        if n not in documented and not any(n.startswith(g) for g in globs))
    assert not missing, f"package names missing from python-api.md: {missing}"
