"""Pretrained registry (reference utils/utils.py:22-59, 375-407): all 35
reference tags present; local-cache resolution and the no-egress error."""

import os

import pytest

from articulatory_tpu.utils.pretrained import (
    PRETRAINED_MODEL_LIST,
    download_pretrained_model,
)


def test_registry_matches_reference():
    ref_path = "/root/reference/articulatory/utils/utils.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference not mounted")
    import re

    src = open(ref_path).read()
    block = re.search(r"PRETRAINED_MODEL_LIST = \{(.*?)\}", src, re.S).group(1)
    ref_tags = set(re.findall(r'"([^"]+)":', block))
    assert ref_tags == set(PRETRAINED_MODEL_LIST)


def test_unknown_tag_asserts():
    with pytest.raises(AssertionError):
        download_pretrained_model("no_such_tag.v1")


def test_cache_resolution(tmp_path):
    tag = "ljspeech_hifigan.v1"
    with pytest.raises(FileNotFoundError, match="no network access"):
        download_pretrained_model(tag, download_dir=str(tmp_path))
    tag_dir = tmp_path / tag
    tag_dir.mkdir()
    ckpt = tag_dir / "checkpoint-2500000steps.pkl"
    ckpt.write_bytes(b"\x00")
    assert download_pretrained_model(tag, download_dir=str(tmp_path)) == str(ckpt)
