"""Bundled rule-based POS tagger / noun chunker (sprc_tpu/text/pos.py) —
the spaCy stand-in for Img2Prompt answer extraction (reference
img2prompt_vqa.py:25,252-310)."""

import numpy as np

from sprc_tpu.text.pos import (
    OPEN_POS,
    answer_candidates,
    entities,
    noun_chunks,
    pos_of_last_word,
    tag_text,
    tokenize,
)


def test_closed_classes_tagged_by_lexicon():
    tags = dict(tag_text("the dog is on a table and it runs quickly"))
    assert tags["the"] == "DET"
    assert tags["is"] == "AUX"
    assert tags["on"] == "ADP"
    assert tags["a"] == "DET"
    assert tags["and"] == "CONJ"
    assert tags["it"] == "PRON"
    assert tags["quickly"] == "ADV"
    assert tags["dog"] == "NOUN"
    assert tags["table"] == "NOUN"


def test_suffix_and_lexicon_rules():
    tags = dict(tag_text("a beautiful red dress walking near 3 cars"))
    assert tags["beautiful"] == "ADJ"
    assert tags["red"] == "ADJ"          # lexicon, not the -ed verb rule
    assert tags["walking"] == "VERB"
    assert tags["3"] == "NUM"
    assert tags["dress"] == "NOUN"
    assert dict(tag_text("a bed in a building"))["bed"] == "NOUN"
    assert dict(tag_text("a bed in a building"))["building"] == "NOUN"


def test_noun_chunks_spacy_shape():
    tagged = tag_text("the big red dog chases a ball near two tall trees")
    chunks = noun_chunks(tagged)
    assert "the big red dog" in chunks
    assert "a ball" in chunks
    assert "two tall trees" in chunks


def test_answer_candidates_reference_shape():
    """Open-class tokens in order, then <4-word noun chunks — the exact
    extraction the reference feeds answer_extraction."""
    cands = answer_candidates("a man riding a red bike.")
    assert "man" in cands and "riding" in cands and "bike" in cands
    assert "red" in cands
    # closed classes never become answer candidates
    assert "a" not in cands
    # the 2-word chunk survives, a 4-word chunk would not
    assert "a man" in cands
    long = answer_candidates("the very big old red barn door")
    assert all(len(c.split()) < 4 for c in long if " " in c)


def test_candidate_frequency_drives_answer_order():
    """Mirrors answer_extraction's sort-by-count over multiple captions."""
    caps = ["a dog on grass", "a dog with a ball", "a cat sleeping"]
    all_cands = [c for cap in caps for c in answer_candidates(cap)]
    counts = {c: all_cands.count(c) for c in set(all_cands)}
    assert counts["dog"] > counts["cat"]


def test_entities_capitalized_spans():
    """Mid-sentence capitalized runs become entity spans — the bundled
    analogue of reference img2prompt_vqa.py:273-281 doc.ents."""
    assert entities(tokenize("a photo of Barack Obama smiling")) == [
        "Barack Obama"]
    assert entities(tokenize("a street sign in New York City")) == [
        "New York City"]
    # ALLCAPS acronyms qualify
    assert entities(tokenize("a NASA rocket on a pad")) == ["NASA"]
    # capitalized function words never start a span
    assert entities(tokenize("a dog and The end")) == []


def test_entities_sentence_initial_rules():
    # ordinary sentence-initial casing is NOT an entity...
    assert entities(tokenize("Dogs run on grass")) == []
    # ...unless it is a gazetteer name or a multi-word capitalized span
    assert entities(tokenize("Paris at night")) == ["Paris"]
    assert entities(tokenize("Eiffel Tower at night")) == ["Eiffel Tower"]


def test_entities_lowercase_gazetteer():
    """Caption generators emit lowercase text, so gazetteer names fire
    without casing; ambiguous lexicon words ("may" AUX) do not."""
    assert entities(tokenize("a trip to paris in the rain")) == ["paris"]
    assert entities(tokenize("she may go to the store")) == []
    assert entities(tokenize("soldiers march down the road")) == []


def test_answer_candidates_include_entities():
    """Named-entity answers reach the candidate list even when the token
    pass already captured their words — span text dedups against tokens
    like the reference's `if ent.text not in answers` guard."""
    cands = answer_candidates("a photo of Barack Obama in Paris")
    assert "Barack Obama" in cands
    assert "Paris" in cands
    # the ENTITY append dedups against collected tokens ("Paris" token
    # already present -> ent skipped), but the chunk pass re-appends
    # unconditionally like the reference: token + chunk = exactly 2
    assert cands.count("Paris") == 2


def test_pos_of_last_word():
    assert pos_of_last_word("a red dress.") == "NOUN"
    assert pos_of_last_word("running") == "VERB"
    assert pos_of_last_word("beautiful") == "ADJ"


def test_open_pos_constant_matches_reference():
    # reference img2prompt_vqa.py:25
    assert set(OPEN_POS) == {"NOUN", "VERB", "ADJ", "ADV", "NUM"}


def test_img2prompt_default_extraction_uses_pos(monkeypatch):
    """Pipeline default (no injected tagger) routes through the bundled
    tagger and produces reference-shaped contexts."""
    from sprc_tpu.models.pnp_vqa import Img2PromptVqaPipeline

    pipe = Img2PromptVqaPipeline.__new__(Img2PromptVqaPipeline)
    pipe.tagger = None
    contexts, answers, ans_to_cap = pipe.answer_extraction(
        ["a man riding a bike", "a man with a hat"])
    assert answers[-1] == "yes."
    assert answers[0] == "man."  # highest frequency candidate first
    assert all(a.endswith(".") for a in answers)
    assert contexts[0].startswith("answer: man.  context: ")
    assert ans_to_cap["man"] == [0, 1]
    assert np.all([isinstance(c, str) for c in contexts])
