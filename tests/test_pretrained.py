"""Pretrained registry + downloader (reference utils/utils.py:22-59, 375-407):
all 35 reference tags present; local-cache resolution; the full network fetch
path (Drive interstitial confirm-token dance, locked download, flattened tar
extraction) exercised against a local mock HTTP server — the build env has no
egress, so the mock is the only way to execute this path."""

import io
import os
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

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


def test_cache_resolution(tmp_path, monkeypatch):
    # point the fetch at a closed local port so the no-egress failure is fast
    monkeypatch.setenv("ARTICULATORY_PRETRAIN_URL", "http://127.0.0.1:1/uc")
    tag = "ljspeech_hifigan.v1"
    with pytest.raises(FileNotFoundError, match="download from .* failed"):
        download_pretrained_model(tag, download_dir=str(tmp_path))
    tag_dir = tmp_path / tag
    tag_dir.mkdir()
    ckpt = tag_dir / "checkpoint-2500000steps.pkl"
    ckpt.write_bytes(b"\x00")
    assert download_pretrained_model(tag, download_dir=str(tmp_path)) == str(ckpt)


def _make_archive(ckpt_name="checkpoint-400000steps.pkl",
                  payload=b"torch-pickle-bytes"):
    """tar.gz with the checkpoint nested in a directory (flattening must
    strip it, matching the reference's basename extraction) plus extras."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name, data in [
            (f"exp/train_all/{ckpt_name}", payload),
            ("exp/train_all/config.yml", b"generator_type: HiFiGANGenerator\n"),
            ("exp/train_all/stats.h5", b"\x89HDF"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        tar.addfile(tarfile.TarInfo("exp/train_all/"))  # dir member: skipped
    return buf.getvalue()


class _DriveHandler(BaseHTTPRequestHandler):
    """Mimics drive.google.com/uc: an HTML virus-scan interstitial first,
    the tarball once ?confirm= is echoed back."""

    archive = b""
    interstitial = True
    hits = None  # list shared with the test

    def do_GET(self):
        self.hits.append(self.path)
        if self.interstitial and "confirm=" not in self.path:
            body = (b'<html><a href="#">Download anyway'
                    b'&amp;confirm=tOkEn_-123</a></html>')
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/x-gzip")
        self.send_header("Content-Length", str(len(self.archive)))
        self.end_headers()
        self.wfile.write(self.archive)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture()
def drive_server():
    handler = type("H", (_DriveHandler,), {"hits": []})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, handler
    srv.shutdown()
    t.join()


def test_download_with_interstitial(tmp_path, monkeypatch, drive_server):
    srv, handler = drive_server
    handler.archive = _make_archive()
    monkeypatch.setenv("ARTICULATORY_PRETRAIN_URL",
                       f"http://127.0.0.1:{srv.server_address[1]}/uc")
    tag = "ljspeech_hifigan.v1"
    path = download_pretrained_model(tag, download_dir=str(tmp_path))
    # flattened extraction: the nested exp/train_all/ prefix is stripped
    assert path == str(tmp_path / tag / "checkpoint-400000steps.pkl")
    assert open(path, "rb").read() == b"torch-pickle-bytes"
    assert (tmp_path / tag / "config.yml").exists()
    assert (tmp_path / tag / "stats.h5").exists()
    # interstitial then confirmed fetch, confirm token threaded through
    assert len(handler.hits) == 2
    assert "confirm=tOkEn_-123" in handler.hits[1]
    # the archive is kept next to the tag dir, as in the reference
    assert (tmp_path / f"{tag}.tar.gz").exists()

    # second call resolves from cache without touching the server
    again = download_pretrained_model(tag, download_dir=str(tmp_path))
    assert again == path and len(handler.hits) == 2


def test_download_direct_binary(tmp_path, monkeypatch, drive_server):
    srv, handler = drive_server
    handler.archive = _make_archive(ckpt_name="checkpoint-1000000steps.pkl")
    handler.interstitial = False
    monkeypatch.setenv("ARTICULATORY_PRETRAIN_URL",
                       f"http://127.0.0.1:{srv.server_address[1]}/uc")
    tag = "vctk_parallel_wavegan.v1"
    path = download_pretrained_model(tag, download_dir=str(tmp_path))
    assert path.endswith("checkpoint-1000000steps.pkl")
    assert len(handler.hits) == 1
    assert f"id={PRETRAINED_MODEL_LIST[tag]}" in handler.hits[0]


def test_download_archive_without_checkpoint(tmp_path, monkeypatch,
                                             drive_server):
    srv, handler = drive_server
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        info = tarfile.TarInfo("readme.txt")
        info.size = 2
        tar.addfile(info, io.BytesIO(b"hi"))
    handler.archive = buf.getvalue()
    handler.interstitial = False
    monkeypatch.setenv("ARTICULATORY_PRETRAIN_URL",
                       f"http://127.0.0.1:{srv.server_address[1]}/uc")
    with pytest.raises(FileNotFoundError, match="contained no checkpoint"):
        download_pretrained_model("kss_parallel_wavegan.v1",
                                  download_dir=str(tmp_path))


def test_corrupt_cached_archive_self_heals(tmp_path, monkeypatch,
                                           drive_server):
    """A truncated/garbage tar.gz in the cache must raise the friendly
    FileNotFoundError AND be deleted so the next call re-downloads
    (round-2 advisor finding: a bad archive used to wedge the tag)."""
    srv, handler = drive_server
    handler.archive = _make_archive()
    handler.interstitial = False
    monkeypatch.setenv("ARTICULATORY_PRETRAIN_URL",
                       f"http://127.0.0.1:{srv.server_address[1]}/uc")
    tag = "csmsc_hifigan.v1"
    bad = tmp_path / f"{tag}.tar.gz"
    bad.write_bytes(b"this is not a tarball")
    with pytest.raises(FileNotFoundError, match="download from .* failed"):
        download_pretrained_model(tag, download_dir=str(tmp_path))
    assert not bad.exists()  # self-healed
    # next call re-fetches from the server and succeeds
    path = download_pretrained_model(tag, download_dir=str(tmp_path))
    assert path.endswith("checkpoint-400000steps.pkl")
    assert len(handler.hits) == 1


class _FormHandler(BaseHTTPRequestHandler):
    """Mimics the current Drive flow: /uc serves an HTML download form with
    entity-escaped values and a relative action; the form target serves the
    tarball only when every hidden field round-trips."""

    archive = b""
    hits = None

    def do_GET(self):
        self.hits.append(self.path)
        if self.path.startswith("/uc"):
            body = (b'<html><form action="/download&#63;source=uc" method="get">'
                    b'<input type="hidden" name="id" value="abc123">'
                    b'<input type="hidden" name="confirm" value="t&amp;ok">'
                    b'<input type="hidden" name="uuid" value="u-1">'
                    b'</form></html>')
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        import urllib.parse

        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        assert q["confirm"] == ["t&ok"] and q["uuid"] == ["u-1"]
        self.send_response(200)
        self.send_header("Content-Type", "application/x-gzip")
        self.send_header("Content-Length", str(len(self.archive)))
        self.end_headers()
        self.wfile.write(self.archive)

    def log_message(self, *a):
        pass


def test_download_form_interstitial(tmp_path, monkeypatch):
    handler = type("H", (_FormHandler,), {"hits": []})
    handler.archive = _make_archive()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        monkeypatch.setenv("ARTICULATORY_PRETRAIN_URL",
                           f"http://127.0.0.1:{srv.server_address[1]}/uc")
        tag = "jsut_hifigan.v1"
        path = download_pretrained_model(tag, download_dir=str(tmp_path))
        assert path.endswith("checkpoint-400000steps.pkl")
        # interstitial form + the resolved (unescaped, urljoined) fetch
        assert len(handler.hits) == 2
        assert handler.hits[1].startswith("/download?source=uc")
    finally:
        srv.shutdown()
        t.join()
