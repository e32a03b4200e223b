"""Golden parity: our task templates vs the reference's own config.py
(pure Python, imported directly as the oracle — same approach as
tests/test_golden_adapter.py)."""

import importlib.util
import sys

import pytest

from ap_adapter_tpu.configs import get_task_config

REF = "/root/reference/config.py"


pytestmark = pytest.mark.quick

def _ref_get_config():
    spec = importlib.util.spec_from_file_location("ref_config", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config


@pytest.mark.parametrize("task", [
    "timbre_transfer", "style_transfer", "accompaniment_generation", "test",
])
def test_task_templates_match_reference(task):
    ref = _ref_get_config()(task)
    ours = get_task_config(task)

    assert ours.ap_scale == ref["ap_scale"]
    assert ours.time_pooling == ref["time_pooling"]
    assert ours.freq_pooling == ref["freq_pooling"]
    assert ours.guidance_scale == ref["guidance_scale"]
    assert ours.num_files == ref["output_num_files"]
    # reference nests each positive prompt as a batch-of-1 list (except the
    # bare-string "test" template)
    want = [p[0] if isinstance(p, list) else p for p in ref["positive_text_prompt"]]
    assert list(ours.positive_text_prompts) == want
    assert list(ours.negative_text_prompts) == list(ref["negative_text_prompt"])
    assert ours.output_dir  # ref's default dir name is the task; ours is arg-driven
