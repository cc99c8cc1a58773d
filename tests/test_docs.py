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


def test_api_reference_names_exist():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import mrcal_tpu
    text = (DOC / "python-api.md").read_text()
    # comma/newline-separated identifier lists inside the prose
    names = set(re.findall(r"\b([a-z][a-zA-Z0-9_]{3,})\b",
                           text.replace("`", " ")))
    # restrict to names that look like our API (avoid prose words): those
    # with an underscore or a known prefix
    candidates = {n for n in names
                  if ("_" in n and not n.startswith("doc")
                      and not n.endswith("_")   # glob shorthand like state_index_*
                      and n not in ("get_gradients", "camera_info",
                                    "out_of", "jax_sharding", "mrcal_tpu"))}
    have = set(dir(mrcal_tpu))
    from mrcal_tpu import parallel
    have |= set(dir(parallel))
    have |= set(dir(mrcal_tpu.CHOLMOD_factorization))    # methods named too
    missing = sorted(n for n in candidates if n not in have)
    assert not missing, f"python-api.md names missing from package: {missing}"
