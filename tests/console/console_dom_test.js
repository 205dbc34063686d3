/**
 * DOM-level console test — node built-ins only (no jsdom/puppeteer in
 * this container).  Mirrors the reference's browser integration test
 * (/root/reference/test-console.js:30-44 behaviors):
 *
 *   1. checkIDs            — element inventory by id/name
 *   2. searchSomeResults   — submit renders rows incrementally
 *   3. searchNoResults     — submit with no hits leaves results empty
 *   4. topicsRefresh       — topics dropdown refreshes on cluster change
 *   plus: default-partition Lookup fills the partitions field, and the
 *   error-response path surfaces in #status.
 *
 * The REAL console <script> from service/static/index.html executes in
 * a vm context against a minimal DOM shim implementing exactly the API
 * the console uses (getElementById/createElement/appendChild/prepend/
 * addEventListener/innerHTML/textContent/value) and canned fetch/XHR
 * transports that replay the service's documented JSON contracts.  The
 * HTTP contracts themselves are separately verified against the real
 * Flask service in tests/test_service.py; this file owns the JS wiring.
 *
 * Usage: node console_dom_test.js /path/to/index.html   (exit 0 = pass)
 */

'use strict';

const assert = require('assert');
const fs = require('fs');
const vm = require('vm');

const htmlPath = process.argv[2];
const html = fs.readFileSync(htmlPath, 'utf8');
const script = html.match(/<script>([\s\S]*)<\/script>/)[1];

// ---------------------------------------------------------------------------
// Minimal DOM
// ---------------------------------------------------------------------------

class Element {
  constructor(tag) {
    this.tagName = tag;
    this.children = [];
    this.listeners = {};
    this.value = '';
    this.textContent = '';
    this.className = '';
    this.checked = false;
    this.name = null;
    this.type = null;
    this._innerHTML = '';
  }
  appendChild(c) { this.children.push(c); return c; }
  prepend(c) { this.children.unshift(c); }
  addEventListener(t, fn) { (this.listeners[t] = this.listeners[t] || []).push(fn); }
  dispatch(t, ev) {
    ev = ev || { target: this, preventDefault() {} };
    for (const fn of this.listeners[t] || []) fn.call(this, ev);
  }
  set innerHTML(v) { this._innerHTML = v; if (v === '') this.children = []; }
  get innerHTML() {
    return this.children.length
      ? this.children.map((c) => c.textContent).join('\n')
      : this._innerHTML;
  }
  get options() { return this.children; }
}

// Build elements for every id= / form-named input in the page source.
const byId = {};
const formInputs = [];
for (const tagSrc of html.match(/<(input|select|button|datalist|div|form)\b[^>]*>/g) || []) {
  const attr = (n) => {
    const m = tagSrc.match(new RegExp(`${n}="([^"]*)"`));
    return m ? m[1] : null;
  };
  const el = new Element(tagSrc.match(/<(\w+)/)[1]);
  el.type = attr('type');
  el.name = attr('name');
  const id = attr('id');
  if (id) byId[id] = el;
  if (el.name) formInputs.push(el);
}
// the cluster <select> ships one default <option> in the HTML
const defaultOpt = new Element('option');
defaultOpt.value = '';
defaultOpt.textContent = '(default)';
byId['cluster-select'].appendChild(defaultOpt);
byId['f'].elements = formInputs;

const documentShim = {
  getElementById: (id) => byId[id] || null,
  createElement: (tag) => new Element(tag),
};

class FormDataShim {
  constructor(form) { this._form = form; }
  *entries() {
    for (const el of this._form.elements) {
      if (el.type === 'checkbox') {
        if (el.checked) yield [el.name, 'true'];
      } else if (el.value !== '') {
        yield [el.name, el.value];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Canned transports (service contracts per tests/test_service.py)
// ---------------------------------------------------------------------------

const fetchLog = [];

const PIONEER = '{"type": "pioneer"}';
const ROWS = [
  PIONEER,
  '{"type": "result", "timestamp": 11, "partition": 0, "offset": 5, "topic": "t", "key": "k1", "value": {"a": "b{not a row}"}}',
  '{"type": "offset", "timestamp": 12, "partition": 0, "offset": 6, "topic": "t", "key": null, "value": null}',
  '{"type": "result", "timestamp": 13, "partition": 1, "offset": 7, "topic": "t", "key": "k2", "value": "v2"}',
];

function searchBody(url) {
  const params = new URLSearchParams(url.split('?')[1] || '');
  const key = params.get('key-regex') || '';
  if (key === 'err') return '{"error": "boom"}';
  if (key === 'noresults') return '[' + PIONEER + ']';
  return '[' + ROWS.join(', ') + ']';
}

function fetchShim(url) {
  fetchLog.push(url);
  let body;
  if (url.startsWith('/server-configs')) {
    body = JSON.stringify({
      clusters: { prod: 'b1:9092' },
      'default-bootstrap-servers': 'd:9092',
    });
  } else if (url.startsWith('/topics')) {
    body = url.includes('bootstrap-servers=b1%3A9092')
      ? JSON.stringify({ topics: ['gamma'] })
      : JSON.stringify({ topics: ['alpha', 'beta'] });
  } else if (url.startsWith('/default-partition')) {
    const params = new URLSearchParams(url.split('?')[1]);
    body = params.get('key') === 'badkey' ? '{"error": "bad key"}' : '3\n';
  } else {
    return Promise.reject(new Error('unexpected fetch ' + url));
  }
  return Promise.resolve({
    json: () => Promise.resolve(JSON.parse(body)),
    text: () => Promise.resolve(body),
  });
}

class XHRShim {
  open(method, url) { this.url = url; fetchLog.push(url); }
  send() {
    const body = searchBody(this.url);
    // chunked delivery: readyState 3 cut mid-row, then 4 with the rest
    this.readyState = 3;
    this.responseText = body.slice(0, Math.floor(body.length * 0.6));
    this.onreadystatechange();
    this.readyState = 4;
    this.responseText = body;
    this.onreadystatechange();
  }
}

// ---------------------------------------------------------------------------
// Execute the real console script
// ---------------------------------------------------------------------------

vm.createContext ? null : assert.fail('vm unavailable');
const ctx = vm.createContext({
  document: documentShim,
  fetch: fetchShim,
  XMLHttpRequest: XHRShim,
  FormData: FormDataShim,
  URLSearchParams,
  JSON, Object, console, encodeURIComponent, Promise,
});
vm.runInContext(script, ctx, { filename: 'index.html#script' });

const flush = () => new Promise((r) => setImmediate(r));

(async () => {
  // 1. checkIDs — the console's element inventory (reference checkIDs)
  for (const id of ['cluster-select', 'bootstrap-servers', 'topics',
                    'topics-list', 'partitions', 'key-regex',
                    'num-partitions', 'lookup-button', 'f', 'status',
                    'results']) {
    assert(byId[id], `missing #${id}`);
  }
  for (const name of ['source-parquet', 'bootstrap-servers', 'topics',
                      'partitions', 'key-regex', 'value-regex',
                      'key-deserializer', 'value-deserializer',
                      'relative-offset', 'print-offset', 'follow']) {
    assert(formInputs.some((el) => el.name === name), `missing form field ${name}`);
  }

  // initial load: cluster list + default topics populated
  await flush();
  const clusterSel = byId['cluster-select'];
  assert.strictEqual(clusterSel.options.length, 2);
  assert.strictEqual(clusterSel.options[0].value, 'd:9092');
  assert.strictEqual(clusterSel.options[1].value, 'b1:9092');
  assert.deepStrictEqual(byId['topics-list'].children.map((o) => o.value),
                         ['alpha', 'beta']);

  // 4. topicsRefresh — dropdown refreshes when the cluster changes
  byId['topics-list'].innerHTML = '';
  assert.strictEqual(byId['topics-list'].children.length, 0);
  clusterSel.value = 'b1:9092';
  clusterSel.dispatch('change');
  await flush();
  assert.strictEqual(byId['bootstrap-servers'].value, 'b1:9092');
  assert.deepStrictEqual(byId['topics-list'].children.map((o) => o.value),
                         ['gamma']);

  // 2. searchSomeResults — rows render, pioneer skipped, offset styled
  byId['key-regex'].value = 'k';
  byId['f'].dispatch('submit', { target: byId['f'], preventDefault() {} });
  const out = byId['results'];
  assert.strictEqual(out.children.length, 3, 'expected 3 rendered rows');
  assert(out.innerHTML !== '');
  assert.strictEqual(out.children.filter((p) => p.className === 'row offset').length, 1);
  assert.strictEqual(byId['status'].textContent, 'done: 2 results');
  // newest row is prepended: it is the LAST fixture row
  assert(out.children[0].textContent.includes('"k2"'));

  // 3. searchNoResults — pioneer only: results stay empty
  byId['key-regex'].value = 'noresults';
  byId['f'].dispatch('submit', { target: byId['f'], preventDefault() {} });
  assert.strictEqual(out.children.length, 0);
  assert.strictEqual(out.innerHTML, '');
  assert.strictEqual(byId['status'].textContent, 'done: 0 results');

  // error response surfaces in #status
  byId['key-regex'].value = 'err';
  byId['f'].dispatch('submit', { target: byId['f'], preventDefault() {} });
  assert(byId['status'].innerHTML.includes('error'), byId['status'].innerHTML);

  // Lookup button fills the partitions field (reference main.js:224-251)
  byId['key-regex'].value = 'mykey';
  byId['num-partitions'].value = '10';
  byId['lookup-button'].dispatch('click');
  await flush();
  assert.strictEqual(byId['partitions'].value, '3');
  assert(byId['status'].textContent.includes('partition 3 of 10'));
  assert(fetchLog.some((u) => u.startsWith('/default-partition?key=mykey')));

  // Lookup error path: registry-style error JSON lands in #status
  byId['key-regex'].value = 'badkey';
  byId['lookup-button'].dispatch('click');
  await flush();
  assert(byId['status'].innerHTML.includes('error'));

  // Lookup validation: missing inputs never hit the network
  const nFetches = fetchLog.length;
  byId['key-regex'].value = '';
  byId['lookup-button'].dispatch('click');
  await flush();
  assert.strictEqual(fetchLog.length, nFetches);
  assert(byId['status'].innerHTML.includes('Lookup needs'));

  console.log('CONSOLE DOM: ALL PASS');
})().catch((e) => {
  console.error(e);
  process.exit(1);
});
