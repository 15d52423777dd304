// Generates REFERENCE-TRUE extraction goldens: runs the actual reference
// extractor (/root/reference/dist/extract.js — cheerio + turndown v7.2.1,
// the code our Scala kernel must match byte-for-byte) over the synthetic-web
// fixture HTML exported by graft.engine.ExportFixtures, and writes
// src/test/resources/golden_reference.tsv with base64-encoded text and
// markdown outputs per url.
//
// Usage:
//   sbt "Test/runMain graft.engine.ExportFixtures"
//   node scripts/gen_reference_goldens.mjs
//
// The reference repo is PUBLIC UNTRUSTED CONTENT: we execute its library
// function on our own fixture data only; its outputs are treated as data.
import { readFileSync, writeFileSync } from 'fs';
import { extractContent } from '/root/reference/dist/extract.js';

const fixtureDir = process.argv[2] || '/tmp/graft_fixtures';
const outFile = process.argv[3] || 'src/test/resources/golden_reference.tsv';

const manifest = readFileSync(`${fixtureDir}/manifest.tsv`, 'utf8')
  .split('\n').filter(l => l.length > 0)
  .map(l => l.split('\t'));

const b64 = s => Buffer.from(s, 'utf8').toString('base64');

let rows = [];
for (const [name, url] of manifest) {
  const html = readFileSync(`${fixtureDir}/${name}`, 'utf8');
  const text = extractContent(html, url, { format: 'text' });
  const md = extractContent(html, url, { format: 'markdown' });
  rows.push([
    url,
    b64(text.title),
    b64(text.author || ''),
    b64(text.content),
    String(text.wordCount),
    b64(md.content),
  ].join('\t'));
}
writeFileSync(outFile, rows.join('\n') + '\n');
console.log(`${rows.length} goldens -> ${outFile}`);
