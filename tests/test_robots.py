"""robots.txt (RFC 9309) parsing + compliance filtering."""

from jodie_spark.functions.robots import _parse_one, _to_like, filter_by_robots


def test_to_like_patterns():
    assert _to_like("/a/b") == "/a/b%"          # prefix rule
    assert _to_like("/a/*/c$") == "/a/%/c"      # wildcard + anchor
    assert _to_like("/p%q_r") == "/p\\%q\\_r%"  # LIKE metachars escaped


def test_parse_group_selection_and_rules():
    txt = """
# comment
User-agent: gptbot
Disallow: /

User-agent: mybot
Disallow: /only-mine/

User-agent: *
Disallow: /private/
Allow: /private/ok*
Disallow:
Sitemap: https://x/sitemap.xml
"""
    # exact agent group beats '*'; other agents' groups ignored
    assert _parse_one(txt, "MyBot/2.1") == [(False, "/only-mine/%", 11)]
    star = _parse_one(txt, "someone-else")
    assert (False, "/private/%", 9) in star
    assert (True, "/private/ok%%", 11) in star
    assert len(star) == 2  # empty Disallow adds no rule
    # adjacent user-agent lines share one group
    multi = _parse_one(
        "User-agent: a\nUser-agent: b\nDisallow: /x\n", "b"
    )
    assert multi == [(False, "/x%", 2)]
    assert _parse_one("", "anybot") == []


def test_parse_merges_groups_with_same_agent():
    """Regression (round-9 advice): RFC 9309 §2.2.1 — rules from ALL
    groups naming the winning user-agent token merge into one
    effective group; a second 'User-agent: *' group's rules must not
    be dropped."""
    txt = """
User-agent: *
Disallow: /private/

User-agent: gptbot
Disallow: /

User-agent: *
Disallow: /tmp/
Allow: /tmp/ok
"""
    star = _parse_one(txt, "someone-else")
    assert (False, "/private/%", 9) in star
    assert (False, "/tmp/%", 5) in star       # second '*' group kept
    assert (True, "/tmp/ok%", 7) in star
    assert len(star) == 3
    # specific agent: merge across ITS groups, '*' groups excluded
    txt2 = """
User-agent: mybot
Disallow: /a/

User-agent: *
Disallow: /star/

User-agent: mybot
Disallow: /b/
"""
    mine = _parse_one(txt2, "MyBot/1.0")
    assert mine == [(False, "/a/%", 3), (False, "/b/%", 3)]


def test_filter_by_robots_rfc_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.com/public/page"),
            (2, "https://a.com/private/secret"),
            (3, "https://a.com/private/ok/thing"),  # longer Allow wins
            (4, "https://a.com/tmp"),               # $-anchored Disallow
            (5, "https://a.com/tmp/inner"),          # anchor does NOT match
            (6, "https://norobots.org/x"),           # no robots -> allowed
            (7, "not a url"),                         # unparseable -> kept
            (8, None),                                # NULL url -> kept
        ],
        "id long, url string",
    )
    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /private/\n"
                "Allow: /private/ok*\nDisallow: /tmp$\n",
            )
        ],
        "host string, robots_txt string",
    )
    kept = sorted(
        r["id"] for r in filter_by_robots(docs, robots).collect()
    )
    assert kept == [1, 3, 5, 6, 7, 8]
    # agent-specific total block
    robots2 = spark.createDataFrame(
        [("a.com", "User-agent: jodiebot\nDisallow: /\n\nUser-agent: *\nDisallow: /none/\n")],
        "host string, robots_txt string",
    )
    kept2 = sorted(
        r["id"]
        for r in filter_by_robots(docs, robots2, user_agent="jodiebot/1.0").collect()
    )
    assert kept2 == [6, 7, 8]  # every a.com URL blocked for this agent
