"""Conversation templates: prompt strings must match the reference's
conversation.py byte for byte."""

import pytest

from medplib_tpu.data import conversation as conv

from reference_oracle import load_ref_module


@pytest.fixture(scope="module")
def ref():
    import sys
    sys.path.insert(0, "/root/reference/model/medplib")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_conversation", "/root/reference/model/medplib/conversation.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TURNS = [
    ("What is shown in <image>?", "A chest CT scan."),
    ("Where is the lesion? <region></region>", "In the left lobe <SEG>."),
]


@pytest.mark.parametrize("name", ["v1", "llava_v1", "v0", "llava_v0",
                                  "llama_2", "llava_llama_2", "mpt"])
def test_prompt_parity(ref, name):
    ours = conv.conv_templates[name].copy()
    theirs = ref.conv_templates[name].copy()
    theirs.messages = list(theirs.messages)
    for (q, a) in TURNS:
        ours.append_message(ours.roles[0], q)
        ours.append_message(ours.roles[1], a)
        theirs.append_message(theirs.roles[0], q)
        theirs.append_message(theirs.roles[1], a)
    assert ours.get_prompt() == theirs.get_prompt()


def test_prompt_parity_open_generation(ref):
    """Final assistant turn empty (generation prompt)."""
    ours = conv.conv_templates["v1"].copy()
    theirs = ref.conv_templates["v1"].copy()
    theirs.messages = list(theirs.messages)
    for c in (ours, theirs):
        c.append_message(c.roles[0], "Segment the tumor.")
        c.append_message(c.roles[1], None)
    assert ours.get_prompt() == theirs.get_prompt()


def test_plain_single_turn_parity(ref):
    ours = conv.conv_templates["plain"].copy()
    theirs = ref.conv_templates["plain"].copy()
    theirs.messages = list(theirs.messages)
    for c in (ours, theirs):
        c.append_message(c.roles[0], "<image>caption this")
    assert ours.get_prompt() == theirs.get_prompt()


def test_extra_tokens_match_reference_surgery():
    """Token list parity with train_ds_medplib.py:207-216: 9 task tokens then
    <gen_1>..<gen_256> (1-based)."""
    from medplib_tpu.config import EXTRA_TOKENS
    ref = ["<SEG>", "<ref>", "</ref>", "<region>", "</region>",
           "<sr>", "</sr>", "<mask>", "</mask>"]
    ref += [f"<gen_{i}>" for i in range(1, 257)]
    assert list(EXTRA_TOKENS) == ref


@pytest.mark.parametrize("name", ["v0_mmtag", "v1_mmtag", "v1", "v0"])
def test_mmtag_image_tuple_parity(ref, name):
    """Web-UI image-attachment form: first message is (text, image, mode).
    mmtag versions announce the image as its own <Image>..</Image> round
    (reference conversation.py:31-43, 343-378)."""
    ours = conv.conv_templates[name].copy()
    theirs = ref.conv_templates[name].copy()
    theirs.messages = list(theirs.messages)
    for c in (ours, theirs):
        c.append_message(c.roles[0],
                         ("<image>\nDescribe the scan.", object(), "Pad"))
        c.append_message(c.roles[1], "It shows a lung nodule.")
        c.append_message(c.roles[0], "Segment it.")
        c.append_message(c.roles[1], None)
    assert ours.get_prompt() == theirs.get_prompt()
