"""Canonicalizer: golden pairs + idempotence property (SURVEY §5.2)."""

import random

import pytest

from crawlray.functions.canon import canonicalize, host_of, is_crawlable

GOLDEN = [
    # (input, expected canonical)
    ("HTTP://News-1.NL/Artikel", "http://news-1.nl/Artikel"),
    ("https://news-1.nl:443/a", "https://news-1.nl/a"),
    ("http://news-1.nl:80/a", "http://news-1.nl/a"),
    ("http://news-1.nl:8080/a", "http://news-1.nl:8080/a"),
    ("https://news-1.nl", "https://news-1.nl/"),
    ("https://news-1.nl/a/b/../c", "https://news-1.nl/a/c"),
    ("https://news-1.nl/a/./b//c", "https://news-1.nl/a/b/c"),
    ("https://news-1.nl/a/", "https://news-1.nl/a/"),
    ("https://news-1.nl/a#frag", "https://news-1.nl/a"),
    ("https://news-1.nl/a?utm_source=x&id=3", "https://news-1.nl/a?id=3"),
    ("https://news-1.nl/a?b=2&a=1", "https://news-1.nl/a?a=1&b=2"),
    ("https://news-1.nl/a?fbclid=zz", "https://news-1.nl/a"),
    ("https://news-1.nl/%7Euser", "https://news-1.nl/~user"),
    ("https://news-1.nl/a%2Fb", "https://news-1.nl/a/b"),
    ("https://news-1.nl./a", "https://news-1.nl/a"),
    ("ftp://news-1.nl/a", None),
    ("mailto:x@y.nl", None),
    ("javascript:void(0)", None),
    ("", None),
    ("/relative/only", None),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_golden(raw, want):
    assert canonicalize(raw) == want


BASE_GOLDEN = [
    ("artikel/5", "https://news-1.nl/sectie/", "https://news-1.nl/sectie/artikel/5"),
    ("../x", "https://news-1.nl/a/b/c", "https://news-1.nl/a/x"),
    ("/abs", "https://news-1.nl/a/b", "https://news-1.nl/abs"),
    ("//news-2.nl/y", "https://news-1.nl/a", "https://news-2.nl/y"),
    ("?q=1", "https://news-1.nl/a", "https://news-1.nl/a?q=1"),
]


@pytest.mark.parametrize("rel,base,want", BASE_GOLDEN)
def test_join(rel, base, want):
    assert canonicalize(rel, base=base) == want


def test_idempotent_property():
    rng = random.Random(7)
    hosts = ["News-1.NL", "nu.nl", "a.b.example.com:8080"]
    paths = ["", "/", "/a/b/../c", "/x//y/.", "/%7Ea", "/artikel#sec", "/p?z=1&utm_a=2&a=%41"]
    for _ in range(300):
        u = f"http{'s' if rng.random() < 0.5 else ''}://{rng.choice(hosts)}{rng.choice(paths)}"
        c = canonicalize(u)
        if c is not None:
            assert canonicalize(c) == c, u


def test_host_and_crawlable():
    assert host_of("https://news-1.nl:8080/a") == "news-1.nl"
    assert is_crawlable("https://news-1.nl/a")
    assert not is_crawlable("https://news-1.nl/pic.JPG")
    assert not is_crawlable("https://news-1.nl/a", allowed_hosts={"news-2.nl"})
    assert is_crawlable("https://news-1.nl/a", allowed_hosts={"news-1.nl"})
    assert not is_crawlable("x" * 3000)
