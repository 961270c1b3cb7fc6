"""Generator <-> generated-file drift guard (VERDICT r4 #7): psl_data.py is
GENERATED from the OS's published public_suffix_list.dat snapshot; an edit
to the generator (or a hand edit to the data module) that is not
re-materialized would silently diverge the two. Regenerate in-memory and
require byte equality."""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DAT = "/usr/share/publicsuffix/public_suffix_list.dat"
GENERATED = os.path.join(REPO, "visiblev8_crawler_spark", "functions", "psl_data.py")


def test_psl_data_matches_generator_output():
    if not os.path.exists(DAT):
        pytest.skip("no OS public-suffix snapshot on this machine")
    spec = importlib.util.spec_from_file_location(
        "gen_psl_data", os.path.join(REPO, "tools", "gen_psl_data.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    exact, wild, exc, version = gen.parse(DAT)
    produced = gen.emit(exact, wild, exc, version, DAT)
    with open(GENERATED, encoding="utf-8") as f:
        checked_in = f.read()
    assert produced == checked_in, (
        "psl_data.py no longer matches what tools/gen_psl_data.py emits from "
        f"{DAT}. If the generator (or the OS list) changed, re-materialize: "
        "python tools/gen_psl_data.py > visiblev8_crawler_spark/functions/psl_data.py"
    )
