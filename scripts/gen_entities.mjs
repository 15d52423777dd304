// Generates src/main/resources/html_entities.tsv — the WHATWG HTML named
// character reference table (https://html.spec.whatwg.org/multipage/named-characters.html,
// public spec data). Extracted by walking the packed decode trie published by
// the MIT-licensed `entities` npm package (the same table parse5/cheerio use,
// so our decoder matches the reference extractor exactly).
//
// Row format: <name>\t<value>   where <name> keeps its trailing ';' if the
// spec requires one; names WITHOUT ';' are the legacy entities that also
// match unterminated (e.g. "&amp " -> "& ").
//
// Usage: node scripts/gen_entities.mjs
import { writeFileSync } from 'fs';
import { createRequire } from 'module';
const require = createRequire(import.meta.url);
const tree = require('/root/reference/node_modules/entities/lib/generated/decode-data-html.js').default;

const VALUE_LENGTH = 0b1100_0000_0000_0000;
const BRANCH_LENGTH = 0b0011_1111_1000_0000;
const JUMP_TABLE = 0b0000_0000_0111_1111;

const out = [];
function walk(i, path) {
  const current = tree[i];
  const valueLength = (current & VALUE_LENGTH) >> 14;
  if (valueLength !== 0) {
    const cp1 = valueLength === 1 ? (current & ~VALUE_LENGTH) : tree[i + 1];
    let value = String.fromCodePoint(cp1);
    if (valueLength === 3) value += String.fromCodePoint(tree[i + 2]);
    out.push([path, value]);
    // valueLength==1 packs the codepoint into the low 14 bits — such nodes
    // carry no branch data (leaf); reading branches there would loop.
    if (valueLength === 1) return;
  }
  const branchCount = (current & BRANCH_LENGTH) >> 7;
  const jumpOffset = current & JUMP_TABLE;
  const nodeIdx = i + Math.max(1, valueLength);
  if (branchCount === 0) {
    if (jumpOffset !== 0) walk(nodeIdx, path + String.fromCharCode(jumpOffset));
  } else if (jumpOffset !== 0) {
    for (let v = 0; v < branchCount; v++) {
      if (tree[nodeIdx + v] !== 0)
        walk(tree[nodeIdx + v] - 1, path + String.fromCharCode(jumpOffset + v));
    }
  } else {
    for (let k = 0; k < branchCount; k++)
      walk(tree[nodeIdx + branchCount + k], path + String.fromCharCode(tree[nodeIdx + k]));
  }
}
walk(0, '');

// a few entities decode to control chars (&NewLine; &Tab;) — escape those
// in the TSV; the Scala loader unescapes them.
const esc = v => v.replace(/\\/g, '\\\\').replace(/\n/g, '\\n').replace(/\t/g, '\\t').replace(/\r/g, '\\r');
for (const [n] of out)
  if (/[\t\n\r]/.test(n)) throw new Error(`unexpected control char in entity name ${n}`);

out.sort((a, b) => (a[0] < b[0] ? -1 : 1));
const file = 'src/main/resources/html_entities.tsv';
writeFileSync(file, out.map(([n, v]) => `${n}\t${esc(v)}`).join('\n') + '\n');
const legacy = out.filter(r => !r[0].endsWith(';')).length;
console.log(`${out.length} entities (${legacy} legacy no-semicolon) -> ${file}`);
