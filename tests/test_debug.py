"""Debug surface tests transcribed from the reference
(internal/debug/debugger_test.go) plus kernel integration
(defuddle.go:411-423,485-537,599-615)."""

from defuddle_spark.debug import Debugger, format_go_duration


def test_debugger_disabled():
    # debugger_test.go:11-29
    d = Debugger(False)
    called = []
    d.start_timer("parse")
    d.end_timer("parse")
    d.add_removed_element(".ads", "clutter", "div", "text", 1)
    d.add_processing_step("parse", "Parse content", 1, "details")
    d.set_statistics(originalElementCount=10)
    d.set_extractor_used("example")
    d.log_step("log", "Logged step", lambda: called.append(1) or 2)
    assert called == [1]
    assert d.get_info() is None
    assert d.get_summary() == "Debug mode is disabled"


def test_debugger_get_info_and_summary():
    # debugger_test.go:31-66
    d = Debugger(True)
    d.durations["parse"] = 5_000_000  # 5ms in ns
    d.add_processing_step("parse", "Parse content", 2, "Trimmed nodes")
    d.add_removed_element(".ads", "clutter", "div", "short text", 3)
    d.set_statistics(
        originalElementCount=10, finalElementCount=7,
        removedElementCount=3, wordCount=42, characterCount=256,
        imageCount=1, linkCount=4)
    d.set_extractor_used("example")

    info = d.get_info()
    assert info is not None
    assert len(info["processingSteps"]) == 1
    assert len(info["removedElements"]) == 1
    assert info["timings"]["parse"] == 5_000_000
    assert info["processingSteps"][0]["duration"] == 5_000_000
    assert info["extractorUsed"] == "example"

    summary = d.get_summary()
    for frag in ("=== Defuddle Debug Summary ===", "Extractor Used: example",
                 "Original Elements: 10", "Final Elements: 7",
                 "1. Parse content (5ms)", "Elements affected: 2",
                 "Details: Trimmed nodes", "parse: 5ms",
                 "Removed Elements (1 total):", "clutter: 3 elements"):
        assert frag in summary, (frag, summary)


def test_removed_element_truncation():
    # debugger.go:104-115 — >100 chars truncates with ellipsis, trims space
    d = Debugger(True)
    d.add_removed_element("p", "long", "p", " " + "x" * 150, 1)
    rec = d.get_info()["removedElements"][0]
    assert rec["textContent"].endswith("...")
    assert len(rec["textContent"]) <= 104


def test_go_duration_format():
    # Go time.Duration.String() shapes asserted by debugger_test.go ("5ms")
    assert format_go_duration(0) == "0s"
    assert format_go_duration(5_000_000) == "5ms"
    assert format_go_duration(1_500_000_000) == "1.5s"
    assert format_go_duration(500) == "500ns"
    assert format_go_duration(500_000) == "500µs"
    assert format_go_duration(90_000_000_000) == "1m30s"
    assert format_go_duration(3_661_000_000_000) == "1h1m1s"


def test_kernel_debug_standard_path():
    from defuddle_spark import Options, extract_document
    html = ('<html><head><title>T</title></head><body><article><h1>T</h1>'
            '<p>' + 'word ' * 250 + '</p>'
            '<p><a href="/x">link</a> <img src="/i.png" width="400"></p>'
            '</article></body></html>')
    r = extract_document(html, url="https://x.test/a",
                         options=Options(debug=True))
    info = r.debug_info
    assert info is not None
    steps = [s["step"] for s in info["processingSteps"]]
    assert steps == ["schema_org_extraction", "standard_parsing"]
    st = info["statistics"]
    # reference quirk: finalStats recounts "original" from the mutated doc
    assert st["originalElementCount"] == st["finalElementCount"] > 0
    assert st["removedElementCount"] == 0
    assert st["wordCount"] == r.word_count
    assert st["characterCount"] == len(r.content)
    assert st["imageCount"] == 1 and st["linkCount"] == 1
    assert info["timings"]["total_parsing"] > 0
    assert "extractorUsed" not in info


def test_kernel_debug_extractor_path():
    from defuddle_spark import Options, extract_document
    html = ('<html><head><title>HN</title></head><body>'
            '<table class="fatitem"><tr class="athing" id="1">'
            '<td class="title"><span class="titleline">'
            '<a href="https://x.test">Story</a></span></td></tr></table>'
            '</body></html>')
    r = extract_document(html, url="https://news.ycombinator.com/item?id=1",
                         options=Options(debug=True))
    info = r.debug_info
    assert info is not None
    assert info["extractorUsed"].lower() == "hackernews"
    assert info["processingSteps"][-1]["step"] == "extractor"
    assert "Used site-specific extractor" in \
        info["processingSteps"][-1]["description"]


def test_kernel_debug_off_is_none():
    from defuddle_spark import extract_document
    r = extract_document("<html><body><p>hi</p></body></html>")
    assert r.debug_info is None
