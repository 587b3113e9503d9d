"""Parity of the resolution/aspect/frame tables against the ACTUAL reference
file (videosys/training/datasets/open_sora/aspect.py + data_process.py).

These are behavioral constants (generation shapes); a silent formatting slip
(e.g. "1.00" -> "1.0" via a float round-trip) breaks exact-string lookups
like get_image_size("512", "1:1") — which is exactly what happened once."""

import json
import pathlib
import re

REF = pathlib.Path("/root/reference/videosys")


def _ref_tables():
    src = (REF / "training/datasets/open_sora/aspect.py").read_text()
    tables = {}
    for name, body in re.findall(r"(ASPECT_RATIO_\w+)\s*=\s*\{(.*?)\n\}",
                                 src, re.S):
        tables[name] = {k: [int(h), int(w)] for k, h, w in
                        re.findall(r'"([\d.]+)":\s*\((\d+),\s*(\d+)\)', body)}
    res_map = dict(re.findall(r'"(\w+)":\s*\(\d+,\s*(ASPECT_RATIO_\w+)\)',
                              src))
    pixels = dict(re.findall(r'"(\w+)":\s*\((\d+),\s*ASPECT_RATIO_\w+\)',
                             src))
    ar_map = dict(re.findall(r'"([\d:]+)":\s*"([\d.]+)"', src))
    return tables, res_map, pixels, ar_map


def _ours():
    p = (pathlib.Path(__file__).parent.parent / "videosys_tpu" / "pipelines"
         / "open_sora" / "resolution_data.json")
    return json.loads(p.read_text())


def test_aspect_tables_match_reference():
    tables, res_map, pixels, _ = _ref_tables()
    ours = _ours()["RESOLUTIONS"]
    assert set(ours) == set(res_map)
    for rname, tbl in ours.items():
        ref_t = tables[res_map[rname]]
        assert tbl["table"].keys() == ref_t.keys(), rname
        for k, hw in tbl["table"].items():
            assert list(hw) == ref_t[k], (rname, k)
        assert int(tbl["pixels"]) == int(pixels[rname]), rname


def test_aspect_ratio_map_matches_reference():
    *_, ar_map = _ref_tables()
    ours = _ours()["ASPECT_RATIO_MAP"]
    # the reference file also contains other "x": "y" string pairs the regex
    # may catch; check every reference AR entry is present and equal
    for ar, key in ours.items():
        assert ar_map.get(ar) == key, ar


def test_every_named_ar_resolves_where_reference_does():
    from videosys_tpu.pipelines.open_sora.data_process import (
        ASPECT_RATIO_MAP,
        RESOLUTIONS,
        get_image_size,
    )

    for res, spec in RESOLUTIONS.items():
        for ar, key in ASPECT_RATIO_MAP.items():
            if key in spec["table"]:
                h, w = get_image_size(res, ar)
                assert h > 0 and w > 0
    # the lookup that was silently broken
    assert get_image_size("512", "1:1") == (512, 512)


def test_num_frames_map_matches_reference():
    src = (REF / "pipelines/open_sora/data_process.py").read_text()
    m = re.search(r"NUM_FRAMES_MAP\s*=\s*\{(.*?)\}", src, re.S)
    ref = dict(re.findall(r'"([\w]+)":\s*(\d+)', m.group(1)))
    ours = _ours()["NUM_FRAMES_MAP"]
    assert {k: int(v) for k, v in ref.items()} == {k: int(v)
                                                   for k, v in ours.items()}
