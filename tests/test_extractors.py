"""Extractor tests transcribed from /root/reference/extractors/builtins_test.go
and extractor_test.go (dispatch through the kernel)."""

from defuddle_spark import extract_document
from defuddle_spark.dom import parse
from defuddle_spark.extractors import find_extractor
from defuddle_spark.extractors.ai_chats import (ChatGPTExtractor, ClaudeExtractor,
                                                GeminiExtractor, GrokExtractor)
from defuddle_spark.extractors.social import (GitHubExtractor, RedditExtractor,
                                              TwitterExtractor, YouTubeExtractor)


def test_github_issue_and_comments():
    # builtins_test.go:8-52
    doc = parse("""<html><head><title>kaptinlin/defuddle-go: Test issue</title></head><body>
        <meta name="expected-hostname" content="github.com">
        <div data-testid="issue-title">Test issue</div>
        <div data-testid="issue-viewer-issue-container">
            <a data-testid="issue-body-header-author">alice</a>
            <relative-time datetime="2026-04-21T12:00:00Z"></relative-time>
            <div data-testid="issue-body-viewer"><div class="markdown-body"><p>Issue body</p><task-lists><li>task</li></task-lists></div></div>
        </div>
        <div data-wrapper-timeline-id="comment-1">
            <div class="react-issue-comment">
                <a data-testid="avatar-link">bob</a>
                <relative-time datetime="2026-04-22T12:00:00Z"></relative-time>
                <div class="markdown-body"><p>Comment body</p></div>
            </div>
        </div>
    </body></html>""")
    ex = GitHubExtractor(doc, "https://github.com/kaptinlin/defuddle-go/issues/123")
    assert ex.can_extract()
    r = ex.extract()
    assert "Issue body" in r.content_html and "Comment body" in r.content_html
    assert r.extracted_content["owner"] == "kaptinlin"
    assert r.extracted_content["repository"] == "defuddle-go"
    assert r.extracted_content["issueNumber"] == "123"
    assert r.variables["site"] == "GitHub - kaptinlin/defuddle-go"


def test_reddit_post_and_nested_comments():
    # builtins_test.go:53-86
    doc = parse("""<html><body>
        <h1>Reddit title</h1>
        <shreddit-post author="poster"><div slot="text-body"><p>Post body</p></div><div id="post-image"><img src="post.jpg"></div></shreddit-post>
        <shreddit-comment author="commenter" score="7" permalink="/r/golang/comments/abc/test/comment1" depth="0"><faceplate-timeago ts="1776844800"></faceplate-timeago><div slot="comment"><p>First comment</p></div></shreddit-comment>
        <shreddit-comment author="reply" score="3" permalink="/r/golang/comments/abc/test/comment2" depth="1"><div slot="comment"><p>Nested reply</p></div></shreddit-comment>
    </body></html>""")
    ex = RedditExtractor(doc, "https://www.reddit.com/r/golang/comments/abc/test_post/")
    assert ex.can_extract()
    r = ex.extract()
    for want in ("Post body", "First comment", "Nested reply",
                 '<div class="reddit-comments">'):
        assert want in r.content_html
    assert r.extracted_content["postId"] == "abc"
    assert r.extracted_content["subreddit"] == "golang"
    assert r.variables["author"] == "poster"


def test_twitter_thread_text_media_metadata():
    # builtins_test.go:87-126
    doc = parse("""<html><body><main role="main">
        <article data-testid="tweet">
            <div data-testid="User-Name"><a>Alice Example</a><a>alice</a></div>
            <a href="/alice/status/123"><time datetime="2026-04-21T12:00:00Z"></time></a>
            <div data-testid="tweetText"><span>Hello</span> <a href="/bob">@bob</a></div>
            <img src="https://pbs.twimg.com/media/photo.jpg?format=jpg&amp;name=small" alt=" A photo ">
        </article>
        <article data-testid="tweet">
            <div data-testid="User-Name"><a>Alice Example</a><a>@alice</a></div>
            <div data-testid="tweetText">Thread reply</div>
        </article>
    </main></body></html>""")
    ex = TwitterExtractor(doc, "https://x.com/alice/status/123")
    assert ex.can_extract()
    r = ex.extract()
    for want in ("tweet-thread", "Hello @bob", "Thread reply", "name=large"):
        assert want in r.content_html, r.content_html
    assert r.extracted_content["tweetId"] == "123"
    assert r.variables["author"] == "@alice"
    assert r.variables["site"] == "X (Twitter)"


def test_chatgpt_messages_and_footnotes():
    # builtins_test.go:127-156
    doc = parse("""<html><head><title>Research chat</title></head><body>
        <article data-testid="conversation-turn-1" data-message-author-role="user"><h5 class="sr-only">You:</h5><div class="text-message">What is Go?</div></article>
        <article data-testid="conversation-turn-2" data-message-author-role="assistant"><h6 class="sr-only">ChatGPT:</h6><p>Go is a language <span><a href="https://example.com/page#:~:text=Go,language" target="_blank" rel="noopener">source</a></span></p><p>   </p><span data-state="closed">copy</span></article>
    </body></html>""")
    ex = ChatGPTExtractor(doc, "https://chatgpt.com/share/test")
    assert ex.can_extract()
    r = ex.extract()
    assert "What is Go?" in r.content_html
    assert 'id="fn:1"' in r.content_html
    assert "copy" not in r.content_html
    assert r.extracted_content["messageCount"] == "2"
    assert r.variables["title"] == "Research chat"


def test_claude_messages():
    # builtins_test.go:157-183
    doc = parse("""<html><head><title>Plan discussion - Claude</title></head><body>
        <div data-testid="user-message"><p>Please draft a plan.</p></div>
        <div data-testid="assistant-message"><p>Here is the plan.</p></div>
    </body></html>""")
    ex = ClaudeExtractor(doc, "https://claude.ai/share/test")
    assert ex.can_extract()
    r = ex.extract()
    assert "Please draft a plan." in r.content_html
    assert "Here is the plan." in r.content_html
    assert r.extracted_content["messageCount"] == "2"
    assert r.variables["title"] == "Plan discussion"


def test_grok_messages_dedup_footnotes():
    # builtins_test.go:184-216
    doc = parse("""<html><head><title>Grok exchange - Grok</title></head><body>
        <div class="relative group flex flex-col justify-center w-full items-end"><div class="message-bubble">User question</div></div>
        <div class="relative group flex flex-col justify-center w-full items-start"><div class="message-bubble"><p>Answer with <a href="https://example.com/a">source</a> and <a href="https://example.com/a">again</a>.</p><div class="relative border border-border-l1 bg-surface-base">artifact</div></div></div>
    </body></html>""")
    ex = GrokExtractor(doc, "https://grok.x.ai/share/test")
    assert ex.can_extract()
    r = ex.extract()
    assert "User question" in r.content_html
    assert "source" in r.content_html
    assert 'id="fn:1"' in r.content_html
    assert 'id="fn:2"' not in r.content_html
    assert "artifact" not in r.content_html
    assert r.extracted_content["messageCount"] == "2"
    assert r.variables["site"] == "Grok"


def test_gemini_messages_sources_table_content():
    # builtins_test.go:217-250
    doc = parse("""<html><head><title>Gemini</title></head><body>
        <div class="title-text">Research title</div>
        <browse-item><a href="https://example.com/source"><span class="domain">example.com</span><span class="title">Source title</span></a></browse-item>
        <div class="conversation-container">
            <user-query><div class="query-text">Summarize this</div></user-query>
            <model-response><div class="model-response-text"><div class="markdown"><div class="table-content">Table body</div></div></div></model-response>
        </div>
    </body></html>""")
    ex = GeminiExtractor(doc, "https://gemini.google.com/app/test")
    assert ex.can_extract()
    r = ex.extract()
    assert "Summarize this" in r.content_html
    assert "Table body" in r.content_html
    assert 'id="fn:1"' in r.content_html
    assert "table-content" not in r.content_html
    assert r.extracted_content["messageCount"] == "2"
    assert r.variables["title"] == "Research title"


def test_hackernews_comment_page():
    # builtins_test.go:291-330
    doc = parse("""<html><body><table class="fatitem">
        <tr><td class="navs"><a href="item?id=100&amp;parent=456">parent</a></td></tr>
        <tr class="comtr" id="456"><td class="ind"><img width="0"></td><td><div class="comment"><span class="score">3 points</span> <a class="hnuser">commenter</a> <span class="age" title="2026-04-22T12:00:00Z"></span><div class="commtext"><p>Main comment content that is long enough for a title preview.</p></div></div></td></tr>
    </table></body></html>""")
    from defuddle_spark.extractors.hackernews import HackerNewsExtractor
    ex = HackerNewsExtractor(doc, "https://news.ycombinator.com/item?id=456")
    assert ex.can_extract()
    r = ex.extract()
    for want in ("main-comment", "commenter", "Main comment content",
                 'href="https://news.ycombinator.com/item?id=100&parent=456"'):
        assert want in r.content_html, r.content_html
    assert r.extracted_content["postId"] == "456"
    assert r.variables["title"].startswith("Comment by commenter: Main comment content")
    assert r.variables["description"] == "Comment by commenter on Hacker News"


def test_youtube_empty_video_id_no_empty_iframe():
    # extractor_test.go:57-94
    html = """<html><head><title>YouTube</title>
        <script type="application/ld+json">
        {"@type": "VideoObject", "name": "Test Video",
         "description": "Test video description", "author": "Test Author",
         "uploadDate": "2024-01-01T00:00:00Z"}
        </script></head>
        <body><h1>Test Video</h1><p>Test video description</p></body></html>"""
    r = extract_document(html, url="https://youtube.com/watch?v=")
    if r.extractor_type == "youtube":
        assert 'src="https://www.youtube.com/embed/"' not in r.content


def test_dispatch_through_kernel_github():
    # extractor_test.go:13-55 + markdown honor test (:124-160)
    html = """<html><head>
        <meta name="expected-hostname" content="github.com">
        <meta name="github-keyboard-shortcuts" content="">
        <title>Test Issue · kepano/defuddle</title></head>
        <body>
        <div data-testid="issue-metadata-sticky">Issue metadata</div>
        <div data-testid="issue-title">Test Issue</div>
        <div data-testid="issue-viewer-issue-container">
            <div data-testid="issue-body-viewer"><div class="markdown-body">
                <p>This is a test issue body.</p></div></div>
        </div></body></html>"""
    r = extract_document(html, url="https://github.com/kepano/defuddle/issues/123")
    assert r.extractor_type == "github"
    assert "This is a test issue body" in r.content

    from defuddle_spark import Options
    r2 = extract_document(html, url="https://github.com/kepano/defuddle/issues/123",
                          options=Options(markdown=True))
    assert r2.content_markdown and "test issue body" in r2.content_markdown


def test_dispatch_routing_order_and_domains():
    # registry.go:152-173 — domain suffix matching
    doc = parse("<html><body><p>x</p></body></html>")
    assert find_extractor(doc, "https://www.reddit.com/r/golang/comments/x/y/") .name() == "Reddit"
    assert find_extractor(doc, "https://youtu.be/abc").name() == "YouTube"
    assert find_extractor(doc, "https://news.ycombinator.com/item?id=5").name() == "HackerNews"
    assert find_extractor(doc, "https://example.com/post") is None


def test_twitter_extractor_safety_through_kernel():
    # extractor_test.go:96-121
    html = """<html><head><title>Twitter</title></head><body>
        <article data-testid="tweet">
            <div data-testid="tweetText"><span>This is a test tweet</span></div>
        </article></body></html>"""
    r = extract_document(html, url="https://twitter.com/user/status/123")
    if r.extractor_type == "twitter":
        assert "test tweet" in r.content
