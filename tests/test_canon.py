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


def test_trap_guard():
    from crawlray.functions.canon import is_trap_path

    # consecutive repeats beyond the run limit are traps
    assert is_trap_path("https://x.nl/a/a/a/p")
    assert is_trap_path("https://x.nl/cal/2020/2020/2020")
    assert not is_trap_path("https://x.nl/a/a/p")        # run of 2 is fine
    assert not is_trap_path("https://x.nl/a/b/a/b/a/b")  # alternating ok
    # unbounded depth is a trap
    assert is_trap_path("https://x.nl/" + "/".join(f"s{i}" for i in range(30)))
    assert not is_trap_path("https://x.nl/" + "/".join(f"s{i}" for i in range(20)))
    # empty segments (//) don't count toward runs or depth
    assert not is_trap_path("https://x.nl/a//a/p")
    assert not is_crawlable("https://news-1.nl/d/d/d/artikel")


def test_fast_path_equals_slow_path():
    """The hot-loop fast path must return byte-identical results to the
    full pipeline for every input it accepts (and defer otherwise)."""
    from crawlray.functions.canon import (
        _fast_canonicalize,
        _slow_canonicalize,
        canonicalize,
    )

    bases = [
        "https://news-3.nl/sectie/1/artikel-9",
        "https://news-3.nl/",
        "http://host.example/x/y/",
        "HTTPS://UPPER.NL/x",          # non-canonical base → must defer
        "https://host:8080/x",         # port → must defer
        "https://user@host/x",         # userinfo → must defer
        None,
    ]
    urls = [
        "/sectie/2/artikel-55", "/", "/a/b/", "/a~b/c.d-e_f",
        "https://news-1.nl/", "https://news-1.nl/pad/naar/stuk",
        "http://h/x", "https://h", "relatief/pad", "../omhoog",
        "/met spatie", "/met%20escape", "/vraag?x=1", "/frag#f",
        "//protocol-relative.nl/x", "/dubbel//slash", "/punt/./hier",
        "/terug/../pad", "/eind/..", "/eind/.", "HTTPS://HOST/X",
        "https://host./x", "https://host:443/x", "ftp://host/x",
        "/pa\\th", "", "  /getrimd  ", "/ümlaut", "https://[::1]/x",
        "/utm-achtig?utm_source=x",
    ]
    n_fast = 0
    for b in bases:
        for u in urls:
            s = u.strip()
            fast = _fast_canonicalize(s, b)
            slow = _slow_canonicalize(s, b)
            if fast is not None:
                n_fast += 1
                assert fast == slow, (u, b, fast, slow)
            assert canonicalize(u, b) == slow, (u, b)
    assert n_fast > 20  # the fast path actually triggers
