"""Conformance tests mirroring /root/reference/test/MarkdownConverter.test.ts
and /root/reference/test/RenderDetection.test.ts — contain / not-contain
assertions on the converted Markdown plus classifier expectations."""

from fetch_engines_ray.functions.converter import (
    convert,
    inject_source_url,
    postprocess_markdown,
)
from fetch_engines_ray.functions.render_detection import (
    assess_html_render_need,
    assess_serialized_content,
    is_rendered_content_meaningfully_better,
    is_soft_block_page,
)

import fixtures_html as fx


def test_f01_table_header_promotion():
    md = convert(fx.F01_TABLE).markdown
    assert "<table>" not in md
    assert "| **Position** | **Weekly Pay Rate**" in md
    assert "Apprentice - under 18 years^" in md


def test_f02_semantic_main_over_cookie_nav():
    md = convert(fx.F02_COOKIE_NAV_MAIN).markdown
    assert "Romar" in md
    assert "Harmonie Ephémère EP" in md
    assert "Add to basket" in md
    assert "Manage preferences" not in md
    assert "Account / Login" not in md


def test_f03_nested_nav_footer_removed():
    md = convert(fx.F03_NESTED_NAV_FOOTER).markdown
    assert "Primed flatsheets" in md
    assert "Upfront Carbon Emissions" in md
    assert "Browse products" not in md
    assert "Get Rebuilt updates" not in md
    assert "Privacy Policy" not in md


def test_f04_relative_url_absolutization():
    md = convert(fx.F04_RELATIVE_URLS, base_url=fx.F04_BASE_URL).markdown
    assert "(https://rebuilt.eco/product/94879ca7-40f2-4a13-8c72-f0f941220132)" in md
    assert "(https://rebuilt.eco/about-us)" in md
    assert "(https://example.org/external)" in md
    assert "(mailto:team@example.org)" in md
    assert "(https://rebuilt.eco/images/product.png)" in md


def test_f05_buttons_removed():
    md = convert(fx.F05_BUTTONS).markdown
    assert "Product Title" in md
    assert "Upfront Carbon Emissions" in md
    assert "Add to shortlist" not in md
    assert "Log in" not in md


def test_f06_dense_adjacent_link_runs_split():
    md = convert(fx.F06_DENSE_LINKS, base_url="https://example.com/products/x").markdown
    assert "[One product with a long descriptive title](https://example.com/p/one)" in md
    assert "[Two product with a long descriptive title](https://example.com/p/two)" in md
    assert "[Three product with a long descriptive title](https://example.com/p/three)" in md
    assert "](https://example.com/p/one)[" not in md
    assert "](https://example.com/p/two)[" not in md


def test_f07_heading_led_link_sections_kept():
    md = convert(fx.F07_HEADING_LINKS, base_url="https://example.com/").markdown
    assert "Recent News" in md
    assert "(https://example.com/news/1)" in md
    assert "(https://example.com/news/2)" in md
    assert "(https://example.com/news/3)" in md


def test_f08_docs_page_without_semantic_main():
    md = convert(fx.F08_DOCS_SIDEBAR).markdown
    assert "Getting Started" in md
    assert "Installation" in md
    assert "npm install my-framework" in md
    assert "Configuration" in md
    assert "configuration file" in md


def test_f09_docs_shared_container():
    md = convert(fx.F09_DOCS_SHARED_CONTAINER).markdown
    assert "Introduction" in md
    assert "Quick Start" in md
    assert "Prerequisites" in md
    assert "comprehensive guide" in md


def test_f10_app_shell_needs_render():
    a = assess_html_render_need(fx.F10_APP_SHELL)
    assert a.render_likely_needed
    assert a.render_likely_needed_score >= 4


def test_f11_content_rich_no_render():
    a = assess_html_render_need(fx.F11_CONTENT_RICH)
    assert not a.render_likely_needed
    assert a.quality_score > 0


def test_best_of_rendered_preference():
    baseline = assess_serialized_content(
        '<html><head><title></title></head><body><div id="app"></div></body></html>', "html"
    )
    candidate = assess_serialized_content(
        "# Example article\n\nThis rendered content now includes the title and body text "
        "that were missing before.",
        "markdown",
    )
    assert is_rendered_content_meaningfully_better(baseline, candidate)


def test_soft_block_positives():
    assert is_soft_block_page(fx.F12_CLOUDFLARE)
    assert is_soft_block_page(fx.F13_CAPTCHA)
    assert is_soft_block_page(fx.F14_ACCESS_DENIED)
    assert is_soft_block_page(fx.F15_TURNSTILE)


def test_soft_block_negatives():
    assert not is_soft_block_page(fx.F16_GENUINE_DOCS)
    assert not is_soft_block_page(fx.F17_PAYWALL_MENTION)
    assert not is_soft_block_page(fx.F17B_METERED_PAYWALL)


def test_f18_forum_extraction():
    md = convert(fx.F18_FORUM).markdown
    assert "Show HN: A new distributed query engine" in md
    assert "genuinely impressive work" in md
    assert "skewed keys" in md
    assert "Guidelines" not in md  # footer scrubbed from comments clone
    assert "Site Home" not in md  # page header not part of forum clone


def test_f19_breadcrumbs_svg_templates_removed():
    md = convert(fx.F19_BREADCRUMB_SVG).markdown
    assert "Article" in md
    assert "Body text" in md
    assert "{{" not in md
    assert "templateVar" not in md
    assert "logo.svg" not in md
    assert "Home" not in md  # breadcrumb removed
    assert "\x07" not in md


def test_f20_title_injected_as_h1():
    md = convert(fx.F20_NO_H1).markdown
    assert md.startswith("# Document Title From Head")
    assert "Section heading" in md


def test_f25_repeated_lines_deduped():
    md = convert(fx.F25_REPEATED_LINES).markdown
    assert md.count("This exact sentence repeats and is longer than thirty characters.") == 1


def test_truncation_at_sentence_boundary():
    md = postprocess_markdown("A" * 100 + ". " + "B" * 200, max_content_length=150)
    assert md.endswith("... (truncated)")
    assert len(md) <= 150 + len("... (truncated)")


def test_inject_source_url():
    md = "# Title\n\nBody text."
    out = inject_source_url(md, "https://example.com/a")
    assert "# Title\n\nSource: https://example.com/a" in out
    # idempotent
    assert inject_source_url(out, "https://example.com/a") == out


def test_f26_code_fences_preserved():
    md = convert(fx.F26_CODE_FENCES).markdown
    assert "```bash\npip install ray[data]\nray start --head\n```" in md
    assert "```python\nimport ray\nray.init()\n```" in md


def test_f27_nested_lists():
    md = convert(fx.F27_NESTED_LISTS).markdown
    assert "1. Prepare the corpus" in md
    assert "2. Run extraction" in md
    assert "3. Validate goldens" in md
    # nested items keep their markers; leading indentation is flattened
    # by postprocess step 6 (per-line trim, markdown-converter.ts:936)
    assert "- fast path" in md
    assert "- warm path" in md


def test_f28_blockquote():
    md = convert(fx.F28_BLOCKQUOTE).markdown
    assert "> The fastest way to clean a page" in md
    assert "That quote summarises the design." in md


def test_f29_th_table_header_not_duplicated():
    md = convert(fx.F29_TH_TABLE).markdown
    assert "| Resource | Limit |" in md
    assert "| --- | --- |" in md
    assert "| CPUs | 32 |" in md
    assert md.count("Resource") == 1  # explicit <th> header: no promotion


def test_f30_inline_formatting():
    md = convert(fx.F30_INLINE_FORMATTING).markdown
    assert "**bold**" in md
    assert "*italics*" in md
    assert "`inline_code()`" in md
    assert "[full guide](https://docs.example.com/guide)" in md


def test_f31_entities_decoded():
    md = convert(fx.F31_ENTITIES).markdown
    assert 'Fish & chips <tag> "quoted" © — dash' in md


def test_f32_br_and_hr():
    md = convert(fx.F32_LINE_BREAKS).markdown
    assert "first line\nsecond line\nthird line" in md
    assert "above the rule\n\n---\n\nbelow the rule" in md


def test_f33_figure_caption():
    md = convert(fx.F33_FIGURE).markdown
    assert "![diagram](https://e.com/a.png)" in md
    assert "A system diagram" in md


def test_f34_definition_list():
    md = convert(fx.F34_DEFINITION_LIST).markdown
    assert "**Arrow**" in md and "Columnar memory format" in md
    assert "**Ray**" in md and "Distributed runtime" in md


def test_f35_nested_blockquote():
    md = convert(fx.F35_NESTED_BLOCKQUOTE).markdown
    assert "> outer words" in md
    assert "> > inner words" in md
