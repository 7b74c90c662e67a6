"""Sitemap discovery (round 11, mm41): robots.txt Sitemap extraction,
urlset/sitemapindex parsing, entity unescaping, whitespace trimming,
namespace handling, and the typed-corruption contract."""

from __future__ import annotations

import pytest

from youbike_etl_pipeline_spark.operators.sitemap import (
    parse_sitemap_xml,
    robots_sitemaps,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_robots_sitemaps_extraction():
    txt = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "sitemap: http://a.example.com/sm.xml  # comment\n"
        "SiteMap: HTTP://B.Example.COM:80/sm.xml\n"
        "Crawl-delay: 2\n"
    )
    assert robots_sitemaps(txt) == [
        "http://a.example.com/sm.xml",
        "HTTP://B.Example.COM:80/sm.xml",  # raw — canonicalization is the caller's
    ]


def test_robots_sitemaps_absent_and_empty_value():
    assert robots_sitemaps("User-agent: *\nDisallow:\n") == []
    assert robots_sitemaps("Sitemap:\nSitemap:   \n") == []


def test_urlset_with_namespace_entities_whitespace():
    body = f"""<?xml version="1.0" encoding="UTF-8"?>
    <urlset {NS}>
      <url><loc>http://example.com/doc/1?b=2&amp;a=1</loc>
           <lastmod>2024-01-01</lastmod><priority>0.8</priority></url>
      <url><loc>
          http://example.com/doc/2
      </loc><changefreq>daily</changefreq></url>
    </urlset>""".encode()
    kind, locs = parse_sitemap_xml(body)
    assert kind == "urlset"
    # entity unescaped, whitespace trimmed, lastmod/priority ignored
    assert locs == [
        "http://example.com/doc/1?b=2&a=1",
        "http://example.com/doc/2",
    ]


def test_urlset_without_namespace():
    kind, locs = parse_sitemap_xml(
        b"<urlset><url><loc>http://e.com/x</loc></url></urlset>"
    )
    assert (kind, locs) == ("urlset", ["http://e.com/x"])


def test_sitemapindex():
    body = f"""<sitemapindex {NS}>
      <sitemap><loc>http://example.com/sm-1.xml</loc>
               <lastmod>2024-01-01</lastmod></sitemap>
      <sitemap><loc>http://example.com/sm-2.xml</loc></sitemap>
    </sitemapindex>""".encode()
    kind, locs = parse_sitemap_xml(body)
    assert kind == "sitemapindex"
    assert locs == ["http://example.com/sm-1.xml", "http://example.com/sm-2.xml"]


def test_foreign_children_and_empty_locs_skipped():
    body = (
        b"<urlset><note>x</note><url><loc></loc></url>"
        b"<url><loc>http://e.com/a</loc></url></urlset>"
    )
    assert parse_sitemap_xml(body) == ("urlset", ["http://e.com/a"])


def test_malformed_xml_typed_error():
    with pytest.raises(ValueError, match="malformed sitemap"):
        parse_sitemap_xml(b"<urlset><url><loc>http://e.com")
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap_xml(b"<html><body>not a sitemap</body></html>")


def test_single_bit_corruption_typed_errors():
    body = b"<urlset><url><loc>http://e.com/a</loc></url></urlset>"
    for i in range(0, len(body), 7):
        mutated = bytearray(body)
        mutated[i] ^= 0x10
        try:
            parse_sitemap_xml(bytes(mutated))
        except ValueError:
            pass  # typed error is the contract; success is fine too
