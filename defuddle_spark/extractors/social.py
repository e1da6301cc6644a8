"""Twitter/X, YouTube, Reddit, and GitHub extractors.

Reimplements /root/reference/extractors/{twitter,youtube,reddit,github}.go.
"""

from __future__ import annotations

import datetime
import re
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

from ..dom import Document, Element, parse_fragment
from ..selectors import find_all, find_first
from . import BaseExtractor, ExtractorResult

_TWITTER_IMAGE_NAME_RE = re.compile(r"&name=\w+$")
_WS_RE = re.compile(r"\s+")
_REDDIT_COMMENTS_RE = re.compile(r"comments/([a-zA-Z0-9]+)")
_REDDIT_SUBREDDIT_RE = re.compile(r"/r/([^/]+)")
_GITHUB_REPO_RE = re.compile(r"github\.com/([^/]+)/([^/]+)")
_GITHUB_ISSUE_RE = re.compile(r"/(?:issues|pull)/(\d+)")
_GITHUB_USER_RE = re.compile(r"github\.com/([^/?#]+)")


def _fragment_root(html: str) -> Element:
    root = Element("#fragment")
    for node in parse_fragment(html):
        root.append(node)
    return root


def _schema_string(data: dict, key: str) -> str:
    v = data.get(key)
    return v if isinstance(v, str) else ""


# ---------------------------------------------------------------------------
# Twitter / X (twitter.go)
# ---------------------------------------------------------------------------

class TwitterExtractor(BaseExtractor):
    _TIMELINE_FALLBACKS = ['[aria-label*="timeline"]', '[aria-label*="Timeline"]',
                           'main[role="main"]', 'section[role="region"]']
    _TWEET_FALLBACKS = ['article[data-testid="tweet"]', 'article[role="article"]']

    def __init__(self, doc: Document, url: str, schema_org_data=None) -> None:
        super().__init__(doc, url, schema_org_data)
        timeline = find_first(doc.html, '[aria-label="Timeline: Conversation"]')
        if timeline is None:
            for sel in self._TIMELINE_FALLBACKS:
                timeline = find_first(doc.html, sel)
                if timeline is not None:
                    break
        all_tweets: List[Element] = []
        if timeline is not None:
            all_tweets = find_all(timeline, 'article[data-testid="tweet"]')
        if not all_tweets:
            for sel in self._TWEET_FALLBACKS:
                all_tweets = find_all(doc.html, sel)
                if all_tweets:
                    break
        self.main_tweet = all_tweets[0] if all_tweets else None
        self.thread_tweets = all_tweets[1:] if len(all_tweets) > 1 else []

    def can_extract(self) -> bool:
        return self.main_tweet is not None

    def name(self) -> str:
        return "Twitter"

    def _format_tweet_text(self, html: str) -> str:
        """twitter.go:formatTweetText — unwrap links/spans, paragraph-ify."""
        if not html:
            return ""
        root = _fragment_root(html)
        for link in find_all(root, "a"):
            link.replace_with_html(link.text().strip())
        for el in find_all(root, "span, div"):
            el.replace_with_html(el.text())
        clean = root.inner_html()
        paragraphs = [p.strip() for p in clean.split("\n") if p.strip()]
        return "\n".join(f"<p>{p}</p>" for p in paragraphs)

    def _user_info(self, tweet: Element) -> Dict[str, str]:
        info = {"full_name": "", "handle": "", "date": "", "permalink": ""}
        name_el = find_first(tweet, '[data-testid="User-Name"]')
        if name_el is not None:
            links = find_all(name_el, "a")
            if len(links) >= 2:
                info["full_name"] = links[0].text().strip()
                info["handle"] = links[1].text().strip()
        ts = find_first(tweet, "time")
        if ts is not None:
            dt = ts.get("datetime") or ""
            if len(dt) >= 10:
                info["date"] = dt[:10]
            link = ts.closest("a")
            if link is not None:
                info["permalink"] = link.get("href") or ""
        return info

    def _quoted_container(self, tweet: Element) -> Optional[Element]:
        quoted = find_first(tweet, '[aria-labelledby*="id__"]')
        if quoted is None:
            return None
        user = find_first(quoted, '[data-testid="User-Name"]')
        if user is None:
            return None
        el: Optional[Element] = user
        while el is not None:
            v = el.get("aria-labelledby")
            if v is not None and "id__" in v:
                return el
            el = el.parent if (el.parent is not None and el.parent.type == 1) else None
        return None

    def _extract_images(self, tweet: Element) -> List[str]:
        images = []
        quoted = self._quoted_container(tweet)
        quoted_ids = set(map(id, quoted.descendants())) if quoted is not None else set()
        for sel in ('[data-testid="tweetPhoto"]', '[data-testid="tweet-image"]',
                    'img[src*="media"]'):
            for img in find_all(tweet, sel):
                if id(img) in quoted_ids:
                    continue
                if img.tag != "img":
                    continue
                src = img.get("src")
                if src is None:
                    continue
                hq = _TWITTER_IMAGE_NAME_RE.sub("&name=large", src)
                alt = _WS_RE.sub(" ", img.get("alt") or "").strip()
                images.append(f'<img src="{hq}" alt="{alt}" />')
        return images

    def _extract_tweet(self, tweet: Optional[Element]) -> str:
        if tweet is None:
            return ""
        text_el = find_first(tweet, '[data-testid="tweetText"]')
        formatted = self._format_tweet_text(text_el.inner_html() if text_el is not None else "")
        images = self._extract_images(tweet)
        info = self._user_info(tweet)
        quoted = self._quoted_container(tweet)
        quoted_content = self._extract_tweet(quoted) if quoted is not None and quoted is not tweet else ""

        out = ['<div class="tweet">', '<div class="tweet-header">',
               f'<span class="tweet-author"><strong>{info["full_name"]}</strong> '
               f'<span class="tweet-handle">{info["handle"]}</span></span>']
        if info["date"]:
            out.append(f' <a href="{info["permalink"]}" class="tweet-date">{info["date"]}</a>')
        out.append("</div>")
        if formatted:
            out.append(f'<div class="tweet-text">{formatted}</div>')
        if images:
            out.append('<div class="tweet-media">')
            for img in images:
                out.append(img)
                out.append("\n")
            out.append("</div>")
        if quoted_content:
            out.append(f'<blockquote class="quoted-tweet">{quoted_content}</blockquote>')
        out.append("</div>")
        return "".join(out).strip()

    def _tweet_id(self) -> str:
        m = re.search(r"/status/(\d+)", self.url)
        return m.group(1) if m else ""

    def _tweet_author(self) -> str:
        """twitter.go:getTweetAuthor — handle normalized to @-prefixed."""
        if self.main_tweet is None:
            return ""
        name_el = find_first(self.main_tweet, '[data-testid="User-Name"]')
        if name_el is None:
            return ""
        links = find_all(name_el, "a")
        if len(links) >= 2:
            handle = links[1].text().strip()
            return handle if handle.startswith("@") else "@" + handle
        return ""

    def extract(self) -> ExtractorResult:
        main_content = self._extract_tweet(self.main_tweet)
        thread = "\n<hr>\n".join(
            c for c in (self._extract_tweet(t) for t in self.thread_tweets) if c)
        parts = ['<div class="tweet-thread">', '<div class="main-tweet">',
                 main_content, "</div>"]
        if thread:
            parts.extend(['<hr><div class="thread-replies">', thread, "</div>"])
        parts.append("</div>")
        content = "".join(parts)
        author = self._tweet_author()
        desc_el = (find_first(self.main_tweet, '[data-testid="tweetText"]')
                   if self.main_tweet is not None else None)
        description = _WS_RE.sub(" ", desc_el.text().strip())[:140] if desc_el is not None else ""
        return ExtractorResult(
            content=content, content_html=content,
            extracted_content={"tweetId": self._tweet_id(), "tweetAuthor": author},
            variables={"title": f"Thread by {author}", "author": author,
                       "site": "X (Twitter)", "description": description})


# ---------------------------------------------------------------------------
# YouTube (youtube.go)
# ---------------------------------------------------------------------------

class YouTubeExtractor(BaseExtractor):
    def can_extract(self) -> bool:
        return True  # youtube.go:CanExtract always true

    def name(self) -> str:
        return "YouTube"

    def _video_data(self) -> dict:
        data = self.schema_org_data
        if isinstance(data, list):
            for item in data:
                if isinstance(item, dict) and item.get("@type") == "VideoObject":
                    return item
        elif isinstance(data, dict) and data.get("@type") == "VideoObject":
            return data
        return {}

    def _video_id(self) -> str:
        parsed = urlparse(self.url)
        host = parsed.hostname or ""
        if "youtube.com" in host:
            return parse_qs(parsed.query).get("v", [""])[0]
        if "youtu.be" in host:
            return parsed.path.lstrip("/")
        return ""

    def extract(self) -> ExtractorResult:
        data = self._video_data()
        description = _schema_string(data, "description")
        if not description:
            el = find_first(self.doc.html, "#description")
            if el is not None:
                description = el.text()
        formatted = f"<p>{description.replace(chr(10), '<br>')}</p>" if description else ""
        video_id = self._video_id()
        if video_id:
            content = (
                f'<iframe width="560" height="315" '
                f'src="https://www.youtube.com/embed/{video_id}" '
                f'title="YouTube video player" frameborder="0" '
                f'allow="accelerometer; autoplay; clipboard-write; encrypted-media; '
                f'gyroscope; picture-in-picture; web-share" '
                f'referrerpolicy="strict-origin-when-cross-origin" '
                f"allowfullscreen></iframe><br>{formatted}")
        else:
            content = formatted

        title = _schema_string(data, "name")
        if not title:
            t = find_first(self.doc.html, "title")
            title = (t.text() if t is not None else "").removesuffix(" - YouTube")

        thumb = data.get("thumbnailUrl")
        if isinstance(thumb, list):
            thumb = thumb[0] if thumb and isinstance(thumb[0], str) else ""
        if not isinstance(thumb, str):
            thumb = ""
        if not thumb and video_id:
            thumb = f"https://img.youtube.com/vi/{video_id}/maxresdefault.jpg"

        truncated = description.strip()
        if len(description) > 200:
            t = description[:200]
            last_space = t.rfind(" ")
            if last_space > 150:
                t = t[:last_space]
            truncated = t.strip()

        return ExtractorResult(
            content=content, content_html=content,
            extracted_content={"videoId": video_id,
                               "author": _schema_string(data, "author")},
            variables={"title": title, "author": _schema_string(data, "author"),
                       "site": "YouTube", "image": thumb,
                       "published": _schema_string(data, "uploadDate"),
                       "description": truncated})


# ---------------------------------------------------------------------------
# Reddit (reddit.go)
# ---------------------------------------------------------------------------

class RedditExtractor(BaseExtractor):
    _FALLBACKS = ["[data-testid='post-content']", ".usertext-body", ".md",
                  "div[data-click-id='text']", "div[data-click-id='body']",
                  "div[id^='thing_t3_']", ".thing.link"]

    def __init__(self, doc: Document, url: str, schema_org_data=None) -> None:
        super().__init__(doc, url, schema_org_data)
        self.shreddit_post = find_first(doc.html, "shreddit-post")

    def can_extract(self) -> bool:
        if self.shreddit_post is not None:
            return True
        return any(find_first(self.doc.html, sel) is not None
                   for sel in self._FALLBACKS)

    def name(self) -> str:
        return "Reddit"

    def _post_content(self) -> str:
        parts: List[str] = []
        if self.shreddit_post is not None:
            text_body = find_first(self.shreddit_post, '[slot="text-body"]')
            if text_body is not None:
                parts.append(text_body.inner_html())
            media = find_first(self.shreddit_post, "#post-image")
            if media is not None:
                parts.append(f'<div id="post-image">{media.inner_html()}</div>')
        else:
            for sel in ("div[data-testid='post-content']", ".usertext-body", ".md",
                        "div[data-click-id='text']", "div[data-click-id='body']"):
                el = find_first(self.doc.html, sel)
                if el is not None and el.inner_html():
                    parts.append(el.inner_html())
                    break
            for sel in ("img[src*='i.redd.it']", "img[src*='preview.redd.it']",
                        "img[src*='external-preview.redd.it']"):
                imgs = find_all(self.doc.html, sel)
                if imgs:
                    parts.extend(img.outer_html() for img in imgs)
                    break
        return "".join(parts)

    def _comments(self) -> str:
        comments = find_all(self.doc.html, "shreddit-comment")
        if not comments:
            for sel in ("div[data-testid='comment']", ".comment",
                        ".comment-area .comment", "div[data-click-id='text']",
                        "div[data-click-id='body']", "div[id^='thing_t3_']",
                        ".thing.link"):
                comments = find_all(self.doc.html, sel)
                if comments:
                    break
        if not comments:
            return ""
        out: List[str] = []
        current_depth = -1
        stack: List[int] = []
        for comment in comments:
            try:
                depth = int(comment.get("depth") or "0")
            except ValueError:
                depth = 0
            author = comment.get("author") or ""
            score = comment.get("score") or ""
            permalink = comment.get("permalink") or ""
            content_el = find_first(comment, '[slot="comment"]')
            content = content_el.inner_html() if content_el is not None else ""
            time_el = find_first(comment, "faceplate-timeago")
            date = ""
            ts = (time_el.get("ts") or "") if time_el is not None else ""
            if ts:
                try:
                    date = datetime.datetime.fromtimestamp(
                        int(ts), datetime.timezone.utc).astimezone().strftime("%Y-%m-%d")
                except (ValueError, OverflowError):
                    date = ""
            if depth == 0:
                while stack:
                    out.append("</blockquote>")
                    stack.pop()
                out.append("<blockquote>")
                stack = [0]
            else:
                if depth < current_depth:
                    while stack and stack[-1] >= depth:
                        out.append("</blockquote>")
                        stack.pop()
                elif depth > current_depth:
                    out.append("<blockquote>")
                    stack.append(depth)
            out.append('<div class="comment">')
            out.append('<div class="comment-metadata">')
            out.append(f'<span class="comment-author"><strong>{author}</strong></span> •')
            out.append(f' <a href="https://reddit.com{permalink}" class="comment-link">{score} points</a> •')
            out.append(f' <span class="comment-date">{date}</span>')
            out.append("</div>")
            out.append(f'<div class="comment-content">{content}</div>')
            out.append("</div>")
            current_depth = depth
        while stack:
            out.append("</blockquote>")
            stack.pop()
        return "".join(out)

    def extract(self) -> ExtractorResult:
        post_content = self._post_content()
        comments = self._comments()
        parts = ['<div class="reddit-post">', '<div class="post-content">',
                 post_content, "</div>", "</div>"]
        if comments:
            parts.extend(["<hr>", "<h2>Comments</h2>",
                          '<div class="reddit-comments">', comments, "</div>"])
        content = "".join(parts).strip()

        m = _REDDIT_COMMENTS_RE.search(self.url)
        post_id = m.group(1) if m else ""
        m = _REDDIT_SUBREDDIT_RE.search(self.url)
        subreddit = m.group(1) if m else ""
        author = (self.shreddit_post.get("author") or "") if self.shreddit_post is not None else ""

        h1 = find_first(self.doc.html, "h1")
        title = h1.text().strip() if h1 is not None else ""
        if not title:
            t = find_first(self.doc.html, "title")
            page_title = t.text().strip() if t is not None else ""
            if page_title and page_title != "Reddit - The heart of the internet":
                title = page_title

        desc_root = _fragment_root(post_content)
        desc = _WS_RE.sub(" ", desc_root.text().strip())
        if len(desc) > 140:
            desc = desc[:140]

        return ExtractorResult(
            content=content, content_html=content,
            extracted_content={"postId": post_id, "subreddit": subreddit,
                               "postAuthor": author},
            variables={"title": title, "author": author,
                       "site": f"r/{subreddit}", "description": desc})


# ---------------------------------------------------------------------------
# GitHub (github.go)
# ---------------------------------------------------------------------------

class GitHubExtractor(BaseExtractor):
    _SITE_INDICATORS = ('meta[name="expected-hostname"][content="github.com"]',
                        'meta[name="octolytics-url"]',
                        'meta[name="github-keyboard-shortcuts"]',
                        ".js-header-wrapper", "#js-repo-pjax-container")
    _PAGE_INDICATORS = ('[data-testid="issue-metadata-sticky"]',
                        '[data-testid="issue-title"]')

    def can_extract(self) -> bool:
        has_site = any(find_first(self.doc.html, s) is not None
                       for s in self._SITE_INDICATORS)
        has_page = any(find_first(self.doc.html, s) is not None
                       for s in self._PAGE_INDICATORS)
        return has_site and has_page

    def name(self) -> str:
        return "GitHub"

    def _author(self, container: Element, selectors: List[str]) -> str:
        for sel in selectors:
            link = find_first(container, sel)
            if link is not None:
                href = link.get("href") or ""
                if href.startswith("/"):
                    return href[1:]
                if "github.com/" in href:
                    m = _GITHUB_USER_RE.search(href)
                    if m and m.group(1):
                        return m.group(1)
        return "Unknown"

    def _clean_body(self, body: Element) -> str:
        root = _fragment_root(body.inner_html())
        for el in find_all(root, 'button, [data-testid*="button"], [data-testid*="menu"]'):
            el.remove()
        for el in find_all(root, ".js-clipboard-copy, .zeroclipboard-container"):
            el.remove()
        return root.inner_html().strip()

    @staticmethod
    def _fmt_date(iso: str) -> str:
        try:
            d = datetime.datetime.fromisoformat(iso.replace("Z", "+00:00"))
            return f"{d.strftime('%B')} {d.day}, {d.year}"
        except ValueError:
            return ""

    def extract(self) -> ExtractorResult:
        m = _GITHUB_REPO_RE.search(self.url)
        owner, repo = (m.group(1), m.group(2)) if m else ("", "")
        m = _GITHUB_ISSUE_RE.search(self.url)
        issue_number = m.group(1) if m else ""

        parts: List[str] = []
        container = find_first(self.doc.html, '[data-testid="issue-viewer-issue-container"]')
        if container is not None:
            author = self._author(container, [
                'a[data-testid="issue-body-header-author"]',
                'a[href*="/users/"][data-hovercard-url*="/users/"]',
                'a[aria-label*="profile"]'])
            time_el = find_first(container, "relative-time")
            ts = (time_el.get("datetime") or "") if time_el is not None else ""
            body = find_first(container, '[data-testid="issue-body-viewer"] .markdown-body')
            if body is not None:
                cleaned = self._clean_body(body)
                header = f'<div class="issue-author"><strong>{author}</strong>'
                if ts:
                    d = self._fmt_date(ts)
                    if d:
                        header += f" opened this issue on {d}"
                header += "</div>\n\n"
                parts.append(header)
                parts.append(f'<div class="issue-body">{cleaned}</div>\n\n')

        processed = set()
        for wrapper in find_all(self.doc.html, "[data-wrapper-timeline-id]"):
            comment = find_first(wrapper, ".react-issue-comment")
            if comment is None:
                continue
            cid = wrapper.get("data-wrapper-timeline-id") or ""
            if not cid or cid in processed:
                continue
            processed.add(cid)
            author = self._author(comment, [
                'a[data-testid="avatar-link"]',
                'a[href^="/"][data-hovercard-url*="/users/"]'])
            time_el = find_first(comment, "relative-time")
            ts = (time_el.get("datetime") or "") if time_el is not None else ""
            body = find_first(comment, ".markdown-body")
            if body is not None:
                cleaned = self._clean_body(body)
                if cleaned:
                    parts.append('<div class="comment">\n')
                    header = f'<div class="comment-header"><strong>{author}</strong>'
                    if ts:
                        d = self._fmt_date(ts)
                        if d:
                            header += f" commented on {d}"
                    header += "</div>\n"
                    parts.append(header)
                    parts.append(f'<div class="comment-body">{cleaned}</div>\n')
                    parts.append("</div>\n\n")

        content = "".join(parts)
        desc_root = _fragment_root(content)
        description = _WS_RE.sub(" ", desc_root.text().strip()[:140])
        t = find_first(self.doc.html, "title")
        title = t.text() if t is not None else ""

        return ExtractorResult(
            content=content, content_html=content,
            extracted_content={"type": "issue", "issueNumber": issue_number,
                               "repository": repo, "owner": owner},
            variables={"title": title, "author": "",
                       "site": f"GitHub - {owner}/{repo}",
                       "description": description})
