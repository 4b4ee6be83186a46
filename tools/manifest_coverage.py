"""Line coverage of the jsonldpy conformance surface under the fixture
manifests. Dev tool for fixture authoring: runs every manifest case through
the library with a sys.settrace line tracer and prints the lines of the
target modules that NO case executes — those are the branches where a latent
conformance bug can still hide (VERDICT r6 #1).

Usage: python tools/manifest_coverage.py [module ...]
Modules default to compact,rdf,flatten,nodemap,expand,context.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jsonld_rs_spark import jsonldpy  # noqa: E402
from jsonld_rs_spark.jsonldpy import (  # noqa: E402
    DefaultNodeGenerator,
    canonical_nquads,
    errors,
    expand,
    jsonld_to_rdf,
)
from jsonld_rs_spark.jsonldpy.compact import compact_document  # noqa: E402
from jsonld_rs_spark.jsonldpy.flatten import flatten  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

PKG = os.path.dirname(jsonldpy.__file__)


def _load(fam: str, name: str):
    with open(os.path.join(FIX, fam, name)) as f:
        return json.load(f)


def run_all() -> None:
    # expand
    man = _load("expand", "manifest.jsonld")
    for seq in man["sequence"]:
        doc = _load("expand", seq["input"])
        base = man["baseIri"] + seq["input"]
        try:
            expand(doc, base=base)
        except errors.JsonLdError:
            pass
    # compact
    man = _load("compact", "manifest.jsonld")
    for seq in man["sequence"]:
        doc = _load("compact", seq["input"])
        ctx = _load("compact", seq["context"])
        opt = seq.get("option") or {}
        try:
            compact_document(
                doc,
                ctx,
                base=man["baseIri"] + seq["input"],
                compact_arrays=opt.get("compactArrays", True),
            )
        except errors.JsonLdError:
            pass
    # toRdf
    man = _load("toRdf", "manifest.jsonld")
    for seq in man["sequence"]:
        doc = _load("toRdf", seq["input"])
        base = man["baseIri"] + seq["input"]
        try:
            canonical_nquads(jsonld_to_rdf(expand(doc, base=base), DefaultNodeGenerator()))
        except errors.JsonLdError:
            pass
    # fromRdf
    from jsonld_rs_spark.jsonldpy import parse_nquads, rdf_to_jsonld
    man = _load("fromRdf", "manifest.jsonld")
    for seq in man["sequence"]:
        with open(os.path.join(FIX, "fromRdf", seq["input"])) as f:
            ds = parse_nquads(f.read())
        opt = seq.get("option", {})
        rdf_to_jsonld(ds, use_native_types=opt.get("useNativeTypes", False),
                      use_rdf_type=opt.get("useRdfType", False))
    # flatten
    man = _load("flatten", "manifest.jsonld")
    for seq in man["sequence"]:
        doc = _load("flatten", seq["input"])
        base = man["baseIri"] + seq["input"]
        try:
            flatten(expand(doc, base=base))
        except errors.JsonLdError:
            pass


def main() -> None:
    mods = sys.argv[1:] or ["compact", "rdf", "flatten", "nodemap", "expand", "context"]
    targets = {os.path.join(PKG, m + ".py") for m in mods}
    hit: dict[str, set[int]] = {t: set() for t in targets}

    def tracer(frame, event, arg):
        fn = frame.f_code.co_filename
        if fn in hit:
            if event == "line":
                hit[fn].add(frame.f_lineno)
            return tracer
        if event == "call":
            # only descend into frames of interest or their direct callers
            return tracer
        return None

    sys.settrace(tracer)
    try:
        run_all()
    finally:
        sys.settrace(None)

    import dis

    for t in sorted(targets):
        src = open(t).read().splitlines()
        code = compile(open(t).read(), t, "exec")
        executable: set[int] = set()

        def walk(c):
            for _off, line in dis.findlinestarts(c):
                if line:
                    executable.add(line)
            for const in c.co_consts:
                if hasattr(const, "co_code"):
                    walk(const)

        walk(code)
        # ignore def/class/decorator/docstring-ish lines that fire at import
        missed = sorted(
            ln
            for ln in executable - hit[t]
            if ln <= len(src)
            and not src[ln - 1].lstrip().startswith(("def ", "class ", "@", '"""', "'''", "#"))
            and src[ln - 1].strip() not in ("", "else:", "try:", "finally:")
        )
        name = os.path.basename(t)
        print(f"== {name}: {len(missed)} unexecuted lines")
        # group into runs for readability
        runs = []
        for ln in missed:
            if runs and ln == runs[-1][1] + 1:
                runs[-1][1] = ln
            else:
                runs.append([ln, ln])
        for a, b in runs:
            snippet = src[a - 1].strip()[:72]
            span = f"{a}" if a == b else f"{a}-{b}"
            print(f"  {span}: {snippet}")


if __name__ == "__main__":
    main()
