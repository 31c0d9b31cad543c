"""Evidence-text builder parity (J1 — reference mergers.py:577-705):
window extraction, non-overlap, cap, truncation, head fallback."""

from hinbox_spark.functions.embeddings import build_evidence


def test_window_around_single_hit():
    text = "x" * 300 + " Department of Defense " + "y" * 300
    ev = build_evidence("Department of Defense", text, window_chars=240)
    assert ev.startswith("Department of Defense: ")
    body = ev.split(": ", 1)[1]
    assert "Department of Defense" in body
    # ±120 chars around the hit (+ name length)
    assert len(body) <= 240 + len("Department of Defense") + 2


def test_max_windows_and_non_overlap():
    hit = " FBI "
    filler = "z" * 400
    text = filler.join([hit] * 6)
    ev = build_evidence("FBI", text, window_chars=100, max_windows=3)
    body = ev.split(": ", 1)[1]
    assert body.count("FBI") == 3  # capped at 3 windows
    assert " ... " in body


def test_adjacent_hits_collapse_to_one_window():
    text = "start FBI FBI FBI end"
    ev = build_evidence("FBI", text, window_chars=240, max_windows=3)
    body = ev.split(": ", 1)[1]
    # all hits inside one window → no join separator
    assert " ... " not in body


def test_head_fallback_when_name_absent():
    text = "a" * 2000
    ev = build_evidence("Ghost Entity", text, max_chars=1500)
    body = ev.split(": ", 1)[1]
    assert body == "a" * 1500


def test_truncation_cap():
    text = ("FBI " + "w" * 300) * 10
    ev = build_evidence("FBI", text, window_chars=1000, max_windows=3, max_chars=500)
    assert len(ev.split(": ", 1)[1]) <= 500


def test_case_insensitive_matching():
    text = "the federal bureau talked. " + "q" * 100 + " Federal Bureau again"
    ev = build_evidence("FEDERAL BUREAU", text, window_chars=20, max_windows=2)
    assert " ... " in ev  # both case variants found, far enough apart
