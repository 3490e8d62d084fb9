"""Public-suffix snapshot for registered-domain extraction.

A curated SNAPSHOT SUBSET of the Mozilla Public Suffix List
(https://publicsuffix.org/ — public data, MPL-2.0): the multi-label
suffixes under which registrations happen, so ``shop.example.co.uk``
groups as ``example.co.uk`` rather than ``co.uk``. Covers the
widely-used ICANN country-code second-level registries plus the
highest-traffic "private section" hosting suffixes (each *.github.io /
*.blogspot.com subdomain is an independent site — grouping them as one
domain would let a single hosting provider blow through domain caps).

Deliberately NOT the full list:
- single-label TLDs are omitted — an unlisted suffix falls back to the
  last-two-labels rule, which is exactly the PSL default rule ``*``;
- wildcard rules are carried as their one-label parents
  (``WILDCARD_PARENTS``: ``*.ck`` → ``ck``) with the published
  exceptions (``EXCEPTION_RULES``: ``!www.ck``); deeper wildcards
  (``*.x.jp`` city rules) are omitted;
- operators accept a caller-supplied suffix table
  (operators/urls.py::with_registered_domain), so a deployment can
  drop in the complete, current list as a one-column DataFrame without
  touching code.

Refresh procedure: download the current list, keep the 2+-label plain
rules you care about, and replace the tuple (or pass your own table).
"""

from __future__ import annotations

PUBLIC_SUFFIXES: tuple[str, ...] = (
    # ---- ICANN section: country-code second-level registries ----
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # Brazil
    "com.br", "edu.br", "gov.br", "net.br", "org.br",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # South Africa
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "org.in", "res.in",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    # Taiwan, Hong Kong, Singapore, Malaysia
    "com.tw", "edu.tw", "gov.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    # South Korea
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    # Mexico, Argentina, Colombia, Peru
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
    "com.co", "edu.co", "gov.co", "net.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "net.pe", "org.pe",
    # Turkey, Ukraine, Israel, Poland
    "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr", "web.tr",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "com.pl", "edu.pl", "net.pl", "org.pl", "waw.pl",
    # Philippines, Vietnam, Thailand, Indonesia
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    "ac.th", "co.th", "go.th", "in.th", "net.th", "or.th",
    "ac.id", "co.id", "go.id", "my.id", "net.id", "or.id", "sch.id",
    "web.id",
    # Egypt, Saudi Arabia, Nigeria, Kenya, Pakistan, Bangladesh
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "sch.sa",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng",
    "ac.ke", "co.ke", "go.ke", "ne.ke", "or.ke", "sc.ke",
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    # ---- private section: hosting providers (subdomain = site) ----
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "pages.dev", "workers.dev", "azurewebsites.net",
    "cloudfront.net", "appspot.com", "neocities.org", "readthedocs.io",
    "s3.amazonaws.com",
)

# one-label parents of the PSL's ``*.<tld>`` wildcard rules: EVERY
# second-level label under these is itself a public suffix (so a
# registrable name has ≥3 labels there), except the names below
WILDCARD_PARENTS: tuple[str, ...] = (
    "bd", "ck", "er", "jm", "kh", "mm", "np", "pg",
)

# ``!name`` exception rules: the name IS registrable even though a
# wildcard would make it a public suffix
EXCEPTION_RULES: tuple[str, ...] = ("www.ck",)
