"""Binary .hdt ControlInfo/Header reader vs the reference's own apple.hdt."""

import os

import pytest

APPLE = "/root/reference/tests/resources/apple.hdt"


@pytest.mark.skipif(not os.path.exists(APPLE), reason="reference fixture absent")
def test_read_apple_hdt_header():
    from de_ray.hdt.hdtfile import read_hdt_header

    h = read_hdt_header(APPLE)
    assert h["format"] == "http://purl.org/HDT/hdt#HDTv1"
    assert h["void:triples"] == 9
    assert h["void:properties"] == 7
    assert h["void:distinctSubjects"] == 2
    assert h["numSharedSubjectObject"] == 1
    assert h["dictionaryblockSize"] == 16


@pytest.mark.skipif(not os.path.exists(APPLE), reason="reference fixture absent")
def test_view_dispatches_to_hdt_file(tmp_path):
    from de_ray.hdt.store import view

    h = view(APPLE)
    assert h["void:triples"] == 9
    with pytest.raises(ValueError):
        view(str(tmp_path / "nope.bin")) if (tmp_path / "nope.bin").write_bytes(b"xxxx") else None


@pytest.mark.skipif(not os.path.exists(APPLE), reason="reference fixture absent")
def test_our_store_header_matches_reference_hdt_header(tmp_path):
    """The parity check, end to end: build OUR store from apple.ttl, read THEIR
    apple.hdt — the shared stat keys must agree."""
    from de_ray.hdt.hdtfile import read_hdt_header
    from de_ray.hdt.store import write_store
    from de_ray.rdfio import read_rdf

    ours = write_store(read_rdf(["/root/reference/tests/resources/apple.ttl"]), str(tmp_path / "s"))
    theirs = read_hdt_header(APPLE)
    for key in ("void:triples", "void:properties", "void:distinctSubjects",
                "numSharedSubjectObject", "dictionaryblockSize"):
        assert ours[key] == theirs[key], key
