// Generates REFERENCE-TRUE selector goldens: runs cheerio's css-select (the
// exact selector engine the reference queries with) over the fixture corpus
// for every selector family the library uses, and records each match list
// as document-order ordinals + tags. Verifies BOTH tree shape (parse5
// error-recovery parity) and selector semantics.
//
// Usage:
//   sbt "Test/runMain graft.engine.ExportFixtures"
//   sbt "Test/runMain graft.core.ExportSelectorCases"
//   node scripts/gen_selector_goldens.mjs
import { readFileSync, writeFileSync } from 'fs';
import { createRequire } from 'module';
const require = createRequire(import.meta.url);
const cheerio = require('/root/reference/node_modules/cheerio/lib/index.js');

const fixtureDir = process.argv[2] || '/tmp/graft_fixtures';
const outFile = process.argv[3] || 'src/test/resources/golden_selectors.tsv';

const manifest = readFileSync(`${fixtureDir}/manifest.tsv`, 'utf8')
  .split('\n').filter(l => l.length > 0).map(l => l.split('\t'));
const selectors = readFileSync(`${fixtureDir}/selectors.tsv`, 'utf8')
  .split('\n').filter(l => l.length > 0)
  .map(b => Buffer.from(b, 'base64').toString('utf8'));

let rows = [];
for (const [name, url] of manifest) {
  const html = readFileSync(`${fixtureDir}/${name}`, 'utf8');
  const $ = cheerio.load(html);
  const all = $('*').toArray(); // document order, html element first
  const sigs = selectors.map(sel => {
    let matched;
    try { matched = $(sel).toArray(); } catch { return '!ERR'; }
    return matched.map(el => `${all.indexOf(el)}/${el.tagName}`).join(',');
  });
  rows.push([url, sigs.join('|')].join('\t'));
}
writeFileSync(outFile, rows.join('\n') + '\n');
console.log(`${rows.length} docs x ${selectors.length} selectors -> ${outFile}`);
