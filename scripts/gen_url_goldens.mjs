// Generates URL-resolution differential goldens with node's WHATWG URL —
// the exact `new URL(href, currentUrl)` call the reference's crawler uses
// to resolve links (src/server.ts:3568). Input cases come from
// /tmp/graft_url_cases.tsv (base \t href, written by
// graft.core.ExportUrlCases); output: src/test/resources/golden_urls.tsv
// (base \t href \t resolved-or-ERR).
import { readFileSync, writeFileSync } from 'fs';

const lines = readFileSync('/tmp/graft_url_cases.tsv', 'utf8')
  .split('\n').filter(l => l.length > 0);
const out = [];
for (const line of lines) {
  const [base, href] = line.split('\t');
  let resolved;
  try {
    resolved = new URL(href, base).toString();
  } catch (e) {
    resolved = 'ERR';
  }
  out.push(`${base}\t${href}\t${resolved}`);
}
writeFileSync('src/test/resources/golden_urls.tsv', out.join('\n') + '\n');
console.log(`${out.length} url goldens`);
