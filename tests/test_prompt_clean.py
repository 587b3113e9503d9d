"""Prompt-cleaning parity: our clean_caption must match the reference's
_clean_caption string-for-string (pipeline_open_sora.py:304-415), since the
cleaned text feeds T5 and any divergence changes the conditioning.

The reference file imports torch/videosys heavyweight deps, so we extract
just the cleaning functions' source and exec them with a stubbed ftfy
(identity — ftfy is absent from this image for both sides).
"""

import pathlib
import re
import textwrap

import pytest

from videosys_tpu.pipelines.open_sora.data_process import (
    clean_caption,
    text_preprocessing,
)

REF_FILE = pathlib.Path(
    "/root/reference/videosys/pipelines/open_sora/pipeline_open_sora.py")


@pytest.fixture(scope="module")
def ref_clean():
    if not REF_FILE.exists():
        pytest.skip("reference tree not mounted")
    src = REF_FILE.read_text()

    # BAD_PUNCT_REGEX definition
    m = re.search(r"BAD_PUNCT_REGEX = re\.compile\(.*?\)  # noqa", src,
                  re.DOTALL)
    assert m, "BAD_PUNCT_REGEX not found in reference"
    prelude = m.group(0)

    def grab(name):
        m = re.search(
            rf"(    def {name}\(.*?\n)(?=    def |    @)", src, re.DOTALL)
        assert m, name
        return textwrap.dedent(m.group(1)).replace("self._basic_clean",
                                                   "_basic_clean")

    body = grab("_basic_clean").replace("@staticmethod\n", "") + grab(
        "_clean_caption").replace("def _clean_caption(self, caption)",
                                  "def _clean_caption(caption)")

    class _Ftfy:
        @staticmethod
        def fix_text(t):
            return t

    import html
    import urllib.parse as ul

    from bs4 import BeautifulSoup

    ns = {"re": re, "html": html, "ul": ul, "ftfy": _Ftfy,
          "BeautifulSoup": BeautifulSoup}
    exec(prelude + "\n" + body, ns)
    return ns["_clean_caption"]


MESSY = [
    "A <b>beautiful</b> sunset over the ocean.",
    "Check https://example.com/video.mp4 NOW!!! Free Shipping",
    "@user123 posted: cats &amp; dogs &quot;playing&quot;",
    "this-is-my-cute-cat-video-file_name.jpg",
    "IMG12345.png taken at 192.168.1.1 #42",
    "  WEIRD   spacing\\n and   CAPS  ",
    "“smart quotes” and ‘apostrophes’ — plus em-dash",
    "item jc6640vc page 12 6640vc231 800x600",
    "%20url%20encoded+plus+signs",
    "***AUSVERKAUFT*** {brackets} [and] (parens) |pipes|",
    "日本語のテキストと English mixed",
    "ends with colon:",
    "'single quoted whole caption'",
]


@pytest.mark.parametrize("text", MESSY)
def test_clean_caption_matches_reference(ref_clean, text):
    assert clean_caption(text) == ref_clean(text)


def test_text_preprocessing_applies_twice(ref_clean):
    # the reference cleans twice (pipeline_open_sora.py:419-421)
    t = "Check https://a.com &amp;quot;x&quot; ***wow*** page 3"
    assert text_preprocessing(t) == ref_clean(ref_clean(t))


def test_text_preprocessing_disabled():
    assert text_preprocessing("  AbC  ", use_text_preprocessing=False) == "abc"
