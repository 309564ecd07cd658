"""Inline HTML fixtures derived from the reference's conformance suite.

Each constant mirrors one test input from
/root/reference/test/MarkdownConverter.test.ts and
/root/reference/test/RenderDetection.test.ts (see FIXTURES.md F01-F26).
"""

F01_TABLE = """<table>
<tbody>
<tr>
<td><strong>Position</strong></td>
<td><strong>Weekly Pay Rate</strong></td>
<td><strong>Plus 16% Superannuation</strong></td>
<td><strong>Total Weekly Remuneration*</strong></td>
</tr>
<tr>
<td>Apprentice - under 18 years^</td>
<td>$722.16</td>
<td>$115.55</td>
<td>$837.71</td>
</tr>
</tbody>
</table>"""

F02_COOKIE_NAV_MAIN = """
      <body>
        <div id="cookies" class="content">
          <p>By continuing your navigation on this website, you accept the use of cookies for statistical purposes.</p>
          <button>Manage preferences</button>
          <button>Refuse all</button>
          <button>Agree to all</button>
        </div>
        <nav class="content">
          <a href="/login">Account / Login</a>
        </nav>
        <main>
          <div id="item" class="content threeColumns">
            <div class="middle">
              <div class="title">
                <h1><span><a href="/artist/romar">Romar</a></span></h1>
                <h2>Harmonie Ephémère EP</h2>
              </div>
              <div class="specs">
                <p><span><a href="/label/rora">RORA </a>(RORA005)</span></p>
                <div class="formats"><span>1x Vinyl</span><span>12"</span><span>EP</span></div>
                <div class="styles">
                  <a href="/genre/electronic">Electronic</a>
                  <a href="/style/tech-house">Tech House</a>
                  <a href="/style/minimal">Minimal</a>
                </div>
                <p>Release date: 11 Jun 2013<a href="/country/switzerland">, Switzerland</a></p>
              </div>
            </div>
            <div class="right">
              <div class="buyButton itemButton available">
                <span class="price">$32</span>
                <span>Add to basket</span>
                <div class="option media"><span class="media">Media: </span><span class="value">Very Good Plus (VG+)</span></div>
              </div>
            </div>
          </div>
        </main>
      </body>"""

F03_NESTED_NAV_FOOTER = """
      <body>
        <main>
          <nav>
            <a href="/products">Browse products</a>
            <a href="/about">About</a>
          </nav>
          <article>
            <h1>Primed flatsheets & weatherboards - Shingles/Rubix</h1>
            <p>Upfront Carbon Emissions</p>
            <p>2.20 kg CO2e / kg (A1-A3)</p>
          </article>
          <footer>
            <p>Get Rebuilt updates</p>
            <a href="/privacy-policy">Privacy Policy</a>
          </footer>
        </main>
      </body>"""

F04_RELATIVE_URLS = """
      <body>
        <main>
          <h1>Product Page</h1>
          <a href="/product/94879ca7-40f2-4a13-8c72-f0f941220132">Classic</a>
          <a href="../about-us">About</a>
          <a href="https://example.org/external">External</a>
          <a href="mailto:team@example.org">Email</a>
          <img src="/images/product.png" alt="Product image" />
        </main>
      </body>"""
F04_BASE_URL = "https://rebuilt.eco/product/2fd68bae-5cc7-41f0-bb30-bc67f3f6f740"

F05_BUTTONS = """
      <body>
        <main>
          <h1>Product Title</h1>
          <button>Add to shortlist</button>
          <button>Log in</button>
          <p>Upfront Carbon Emissions: 2.20 kg CO2e</p>
        </main>
      </body>"""

F06_DENSE_LINKS = """
      <body>
        <main>
          <h2>Links</h2>
          <p><a href="/p/one">One product with a long descriptive title</a><a href="/p/two">Two product with a long descriptive title</a><a href="/p/three">Three product with a long descriptive title</a> supporting context text so this remains part of the main article body.</p>
        </main>
      </body>"""

F07_HEADING_LINKS = """
      <body>
        <main>
          <section>
            <h2>Recent News</h2>
            <a href="/news/1">Launch update</a>
            <a href="/news/2">Research update</a>
            <a href="/news/3">Safety update</a>
          </section>
        </main>
      </body>"""

F08_DOCS_SIDEBAR = """
      <body>
        <div class="layout-wrapper">
          <div class="sidebar">
            <nav>
              <a href="/docs/a">Getting Started</a>
              <a href="/docs/b">Configuration</a>
              <a href="/docs/c">Plugins</a>
              <a href="/docs/d">API Reference</a>
              <a href="/docs/e">Migration Guide</a>
              <a href="/docs/f">FAQ</a>
            </nav>
          </div>
          <div class="docs-content">
            <h1>Getting Started</h1>
            <p>Install the package using your preferred package manager. This guide walks you through
               setting up the project from scratch, including configuration and first steps.</p>
            <h2>Installation</h2>
            <p>Run the following command to install the dependencies needed for the project.</p>
            <pre><code>npm install my-framework</code></pre>
            <h2>Configuration</h2>
            <p>Create a configuration file in your project root with the following content to get started.</p>
          </div>
        </div>
      </body>"""

F09_DOCS_SHARED_CONTAINER = """
      <body>
        <div class="page">
          <div class="top-nav">
            <a href="/">Home</a>
            <a href="/docs">Docs</a>
            <a href="/api">API</a>
            <a href="/blog">Blog</a>
            <a href="/community">Community</a>
          </div>
          <div class="grid">
            <div class="sidebar-nav">
              <a href="/docs/intro">Intro</a>
              <a href="/docs/setup">Setup</a>
              <a href="/docs/config">Config</a>
              <a href="/docs/deploy">Deploy</a>
              <a href="/docs/testing">Testing</a>
              <a href="/docs/advanced">Advanced</a>
              <a href="/docs/plugins">Plugins</a>
              <a href="/docs/themes">Themes</a>
            </div>
            <div class="content-area">
              <h1>Introduction</h1>
              <p>Welcome to the framework documentation. This comprehensive guide covers everything
                 you need to know about building applications with our tools.</p>
              <h2>Quick Start</h2>
              <p>Follow these steps to create your first project and deploy it to production in under five minutes.</p>
              <h3>Prerequisites</h3>
              <p>You will need Node.js version 18 or later and a package manager like npm or pnpm installed.</p>
            </div>
          </div>
        </div>
      </body>"""

F10_APP_SHELL = """<!doctype html>
      <html>
        <head>
          <title></title>
          <script type="module" src="/assets/app.js"></script>
          <script src="/assets/vendor.js"></script>
          <script src="/assets/runtime.js"></script>
        </head>
        <body>
          <div id="root"></div>
        </body>
      </html>"""

F11_CONTENT_RICH = """<!doctype html>
      <html>
        <head>
          <title>Example article</title>
        </head>
        <body>
          <main>
            <article>
              <h1>Example article</h1>
              <p>This page already contains enough text to be useful without a browser render pass.</p>
              <p>It should not be treated as an empty application shell by default.</p>
            </article>
          </main>
        </body>
      </html>"""

F12_CLOUDFLARE = """<!DOCTYPE html>
      <html><head><title>Just a moment...</title></head>
      <body>
        <div class="cf-challenge">
          <h2>Checking your browser before accessing the site.</h2>
          <p>This process is automatic. Your browser will redirect shortly.</p>
        </div>
        <script src="/cdn-cgi/challenge-platform/scripts/main.js"></script>
      </body></html>"""

F13_CAPTCHA = """<!DOCTYPE html>
      <html><head><title>Security Check</title></head>
      <body>
        <h1>Verify you are human</h1>
        <div class="captcha-container">
          <p>Please complete the security check to access this site.</p>
        </div>
      </body></html>"""

F14_ACCESS_DENIED = """<!DOCTYPE html>
      <html><head><title>Access Denied</title></head>
      <body>
        <h1>You have been blocked</h1>
        <p>This website is using a security service to protect itself.</p>
      </body></html>"""

F15_TURNSTILE = """<!DOCTYPE html>
      <html><head><title>Please wait</title></head>
      <body>
        <div class="cf-turnstile"></div>
        <p>We need to verify that you are not a robot.</p>
      </body></html>"""

F16_GENUINE_DOCS = """<!DOCTYPE html>
      <html><head><title>Getting Started - My Framework</title></head>
      <body>
        <main>
          <h1>Getting Started</h1>
          <p>Welcome to the documentation. This guide will walk you through setting up your
             project from scratch, configuring the build system, adding plugins, and deploying
             to production. The framework provides a flexible architecture that scales from
             small prototypes to large enterprise applications.</p>
          <h2>Installation</h2>
          <p>Run npm install my-framework to get started. You can also use yarn or pnpm as
             your package manager. The minimum Node.js version required is 18.0.0.</p>
        </main>
      </body></html>"""

_LONG_CONTENT = " ".join(
    ["This is a paragraph of real content about software development and best practices."] * 50
)
F17_PAYWALL_MENTION = f"""<!DOCTYPE html>
      <html><head><title>My Blog Post</title></head>
      <body>
        <article>
          <h1>How to verify your deployment</h1>
          <p>{_LONG_CONTENT}</p>
        </article>
      </body></html>"""

F17B_METERED_PAYWALL = """<!DOCTYPE html>
      <html><head><title>Investigating modern web scraping techniques</title></head>
      <body>
        <article>
          <h1>Investigating modern web scraping techniques</h1>
          <p>Web scraping has evolved from simple DOM extraction to hybrid rendering pipelines
             that balance cost, latency, and content completeness across static and dynamic pages.</p>
          <p>In this article we compare server-rendered sites, app shells, access-guarded
             properties, and documentation platforms with complex navigation structures.</p>
        </article>
        <section class="metered-paywall">
          <h2>Subscribe to continue reading</h2>
          <p>Create an account or sign in to access the full article.</p>
        </section>
      </body></html>"""

F18_FORUM = """
      <html>
      <head><link rel="canonical" href="https://news.ycombinator.com/item?id=1"></head>
      <body>
        <header><a href="/">Site Home</a><a href="/newest">New</a><a href="/submit">Submit</a></header>
        <table class="fatitem">
          <tr><td class="votelinks"><a href="#">upvote</a></td>
          <td class="titleline"><a href="https://example.org/paper">Show HN: A new distributed query engine</a></td></tr>
          <tr><td class="subtext"><span class="score">412 points</span> by <a href="/user?id=alice">alice</a>
          This submission introduces a new distributed query engine built for large analytical workloads.</td></tr>
        </table>
        <div class="comment-tree">
          <div class="comtr"><div class="comment">This is genuinely impressive work, the shuffle design is clever.</div></div>
          <div class="comtr"><div class="comment">How does it handle skewed keys in the aggregation path?</div></div>
          <div class="comtr"><div class="comment">We benchmarked it against our internal system and it held up well.</div></div>
          <footer><a href="/guidelines">Guidelines</a><a href="/faq">FAQ</a></footer>
        </div>
      </body></html>"""

F19_BREADCRUMB_SVG = """
      <body>
        <nav aria-label="breadcrumb"><ol class="breadcrumb"><li><a href="/">Home</a></li><li><a href="/section">Section</a></li></ol></nav>
        <main>
          <h1>Article {{templateVar}} title</h1>
          <img src="/logo.svg" alt="logo" />
          <svg viewBox="0 0 24 24"><path d="M0 0h24v24H0z"/></svg>
          <p>Body text with control\x07char and template {{ anotherVar }} leftovers.</p>
        </main>
      </body>"""

F20_NO_H1 = """
      <head><title>Document Title From Head</title></head>
      <body>
        <main>
          <p>First paragraph of the article body with enough text to score as content for extraction purposes.</p>
          <h2>Section heading</h2>
          <p>Second paragraph of the article continues here with more detail.</p>
        </main>
      </body>"""

F25_REPEATED_LINES = """
      <body>
        <main>
          <h1>Doc</h1>
          <p>This exact sentence repeats and is longer than thirty characters.<br>This exact sentence repeats and is longer than thirty characters.</p>
          <p>Unique closing sentence for the document body text.</p>
        </main>
      </body>"""

# --- Serializer-focused fixtures (reference behaviors pinned by the
# Kreuzberg conversion surface: code fences, list nesting, blockquotes,
# explicit-<th> tables, inline formatting) ---------------------------------

F26_CODE_FENCES = """
<main>
  <h1>Install guide</h1>
  <p>Run the following command:</p>
  <pre><code class="language-bash">pip install ray[data]
ray start --head</code></pre>
  <p>Then in Python:</p>
  <pre><code class="language-python">import ray
ray.init()</code></pre>
</main>
"""

F27_NESTED_LISTS = """
<main>
  <h1>Checklist</h1>
  <ol>
    <li>Prepare the corpus</li>
    <li>Run extraction
      <ul>
        <li>fast path</li>
        <li>warm path</li>
      </ul>
    </li>
    <li>Validate goldens</li>
  </ol>
</main>
"""

F28_BLOCKQUOTE = """
<main>
  <h1>Review</h1>
  <blockquote><p>The fastest way to clean a page is not to fetch the junk at all.</p></blockquote>
  <p>That quote summarises the design.</p>
</main>
"""

F29_TH_TABLE = """
<main>
  <h1>Limits</h1>
  <table>
    <thead><tr><th>Resource</th><th>Limit</th></tr></thead>
    <tbody>
      <tr><td>CPUs</td><td>32</td></tr>
      <tr><td>Memory</td><td>128 GiB</td></tr>
    </tbody>
  </table>
</main>
"""

F30_INLINE_FORMATTING = """
<main>
  <h1>Typography</h1>
  <p>Use <strong>bold</strong> for warnings, <em>italics</em> for terms,
  and <code>inline_code()</code> for identifiers. See the
  <a href="https://docs.example.com/guide">full guide</a> for details.</p>
</main>
"""

F31_ENTITIES = """
<main>
  <h1>Entities</h1>
  <p>Fish &amp; chips &lt;tag&gt; &quot;quoted&quot; &copy; &#8212; dash</p>
</main>
"""

F32_LINE_BREAKS = """
<main>
  <h1>Lines</h1>
  <p>first line<br>second line<br/>third line</p>
  <p>above the rule</p>
  <hr>
  <p>below the rule</p>
</main>
"""

F33_FIGURE = """
<main>
  <h1>Fig</h1>
  <figure>
    <img src="https://e.com/a.png" alt="diagram">
    <figcaption>A system diagram</figcaption>
  </figure>
</main>
"""

F34_DEFINITION_LIST = """
<main>
  <h1>Terms</h1>
  <dl>
    <dt>Arrow</dt><dd>Columnar memory format</dd>
    <dt>Ray</dt><dd>Distributed runtime</dd>
  </dl>
</main>
"""

F35_NESTED_BLOCKQUOTE = """
<main>
  <h1>Q</h1>
  <blockquote><p>outer words</p><blockquote><p>inner words</p></blockquote></blockquote>
</main>
"""
