"""Conversation base tests transcribed from extractors/conversation_test.go."""

from defuddle_spark.dom import parse
from defuddle_spark.extractors.conversation import (ConversationExtractorBase,
                                                    ConversationMessage,
                                                    ConversationMetadata,
                                                    ConvFootnote)


class _Stub(ConversationExtractorBase):
    def __init__(self, doc, url, messages, metadata, footnotes=()):
        super().__init__(doc, url)
        self._messages = messages
        self._metadata = metadata
        self._footnotes = list(footnotes)

    def can_extract(self):
        return True

    def extract_messages(self):
        return self._messages

    def get_metadata(self):
        return self._metadata

    def get_footnotes(self):
        return self._footnotes


def test_create_content_html():
    # conversation_test.go:39-69
    base = ConversationExtractorBase(parse("<html><body></body></html>"),
                                     "https://claude.ai/share/test")
    html = base.create_content_html(
        [ConversationMessage(author="User", content="Hello there",
                             timestamp="2026-04-21",
                             metadata={"model": "claude"}),
         ConversationMessage(author="Assistant", content="<p>Already wrapped</p>")],
        [ConvFootnote(url="https://example.com/source", text="Source")])
    assert 'data-model="claude"' in html
    assert "<p>Hello there</p>" in html
    assert "<p><p>Already wrapped</p></p>" not in html
    assert 'id="fn:1"' in html


def test_extract_with_defuddle():
    # conversation_test.go:71-120
    stub = _Stub(parse("<html><body></body></html>"),
                 "https://claude.ai/share/test",
                 messages=[ConversationMessage(author="User", content="Hello"),
                           ConversationMessage(author="Assistant", content="Hi")],
                 metadata=ConversationMetadata(title="Test Conversation",
                                               site="Claude"))
    result = stub.extract_with_defuddle()
    assert result.extracted_content["messageCount"] == "2"
    assert result.variables["title"] == "Test Conversation"
    assert result.variables["site"] == "Claude"
    assert result.variables["description"] == "Claude conversation with 2 messages"
    assert "message-user" in result.content_html
    assert "message-assistant" in result.content_html


# -- conversation_extractors_behavior_test.go transcriptions -----------------

def test_chatgpt_fallback_title_and_unknown_role():
    # :8-35
    from defuddle_spark.extractors.ai_chats import ChatGPTExtractor
    q = "Explain how readable extraction handles nested inline content in detail for reviewers"
    doc = parse(f'''<html><head><title>ChatGPT</title></head><body>
        <article data-testid="conversation-turn-1"><h5 class="sr-only">You:</h5><div class="text-message">{q}</div></article>
    </body></html>''')
    ex = ChatGPTExtractor(doc, "https://chatgpt.com/share/fallback")
    messages = ex.extract_messages()
    assert len(messages) == 1
    assert messages[0].metadata["role"] == "unknown"
    assert "sr-only" not in messages[0].content
    meta = ex.get_metadata()
    assert meta.title == q[:50] + "..."
    assert meta.message_count == 1


def test_claude_header_title_and_skips_unknown_blocks():
    # :37-68
    from defuddle_spark.extractors.ai_chats import ClaudeExtractor
    doc = parse('''<html><head><title>Claude</title></head><body>
        <header><div class="font-tiempos">Header conversation title</div></header>
        <div data-testid="user-message"><p>Visible user message.</p></div>
        <div data-testid="tool-output"><p>Hidden tool output.</p></div>
        <div data-testid="assistant-message"><p>Visible assistant message.</p></div>
    </body></html>''')
    ex = ClaudeExtractor(doc, "https://claude.ai/share/header")
    messages = ex.extract_messages()
    assert len(messages) == 2
    assert messages[0].author == "You"
    assert messages[1].author == "Claude"
    assert all("Hidden tool output" not in m.content for m in messages)
    assert ex.get_metadata().title == "Header conversation title"


def test_grok_fallback_title_and_non_http_links():
    # :70-95
    from defuddle_spark.extractors.ai_chats import GrokExtractor
    q = "How should we decide whether additional tests are useful or just coverage noise?"
    doc = parse(f'''<html><head><title>Grok by xAI</title></head><body>
        <div class="relative group flex flex-col justify-center w-full items-end"><div class="message-bubble">{q}</div></div>
        <div class="relative group flex flex-col justify-center w-full items-start"><div class="message-bubble"><p>Use behavior. <a href="#local">local note</a> <a href="mailto:test@example.com">mail</a></p></div></div>
    </body></html>''')
    ex = GrokExtractor(doc, "https://grok.x.ai/share/title")
    messages = ex.extract_messages()
    assert len(messages) == 2
    assert ex.get_footnotes() == []
    assert 'href="#local"' in messages[1].content
    assert "mailto:test@example.com" in messages[1].content
    assert ex.get_metadata().title == q[:50] + "..."


def test_gemini_page_title_extended_response_domain_sources():
    # :97-130
    from defuddle_spark.extractors.ai_chats import GeminiExtractor
    doc = parse('''<html><head><title>Independent research notes</title></head><body>
        <browse-item><a href="https://example.com/domain-only"><span class="domain">example.com</span></a></browse-item>
        <div class="conversation-container">
            <user-query><div class="query-text">Compare parser options.</div></user-query>
            <model-response>
                <div class="model-response-text"><div class="markdown"><p>Regular response</p></div></div>
                <div id="extended-response-markdown-content"><p>Extended response</p></div>
            </model-response>
        </div>
    </body></html>''')
    ex = GeminiExtractor(doc, "https://gemini.google.com/app/extended")
    messages = ex.extract_messages()
    assert len(messages) == 2
    assert "Extended response" in messages[1].content
    assert "Regular response" not in messages[1].content
    fns = ex.get_footnotes()
    assert len(fns) == 1 and fns[0].text == "example.com"
    assert ex.get_metadata().title == "Independent research notes"
