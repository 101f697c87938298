"""Model-loader error paths: malformed files must fail with clear
errors, never half-loaded models (a production framework's load-time
contract; the reference segfaults or throws raw cv::Exceptions on
malformed FileStorage input)."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import (load_any, save_filestorage,
                                           synthetic)


def test_load_any_unknown_extension(tmp_path):
    p = tmp_path / "model.txt"
    p.write_text("not a model")
    with pytest.raises(ValueError):
        load_any(str(p))


def test_load_any_missing_file(tmp_path):
    with pytest.raises((FileNotFoundError, OSError)):
        load_any(str(tmp_path / "nope.xml"))


def test_truncated_xml_fails_cleanly(tmp_path):
    model = synthetic.tiny(seed=1)
    p = tmp_path / "m.xml"
    save_filestorage(str(p), model)
    text = p.read_text()
    (tmp_path / "trunc.xml").write_text(text[: len(text) // 2])
    with pytest.raises(Exception) as ei:
        load_any(str(tmp_path / "trunc.xml"))
    # any structured parse error is fine; a half-loaded PartsModel is not
    assert not isinstance(ei.value, AttributeError)


def test_garbage_xml_fails_cleanly(tmp_path):
    p = tmp_path / "g.xml"
    p.write_text("<opencv_storage><name>x</name></opencv_storage>")
    with pytest.raises(Exception) as ei:
        load_any(str(p))
    assert not isinstance(ei.value, AttributeError)


def test_index_out_of_range_rejected(tmp_path):
    """A structurally-parseable model with an out-of-range filter id
    must fail validate(), not detect garbage."""
    model = synthetic.tiny(seed=1)
    model.components[0].parts[1].filterid[0] = 10 ** 6
    with pytest.raises(ValueError, match="filterid out of range"):
        model.validate()


def test_bad_parent_order_rejected():
    model = synthetic.tiny(seed=1)
    model.components[0].parts[1].parentid = 3   # parent after child
    with pytest.raises(ValueError, match="must precede"):
        model.validate()
