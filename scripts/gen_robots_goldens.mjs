// Generates robots.txt differential goldens with the reference's ACTUAL
// robots library (robots-parser, the one src/robots.ts:91 calls isAllowed
// on). Input: /tmp/graft_robots_cases.tsv (robotsIdx \t b64(robotsTxt) \t
// url \t ua) written by graft.core.ExportRobotsCases; output:
// src/test/resources/golden_robots.tsv with the verdict per case.
import { readFileSync, writeFileSync } from 'fs';
import { createRequire } from 'module';
const require = createRequire(import.meta.url);
const robotsParser = require('/root/reference/node_modules/robots-parser');

const lines = readFileSync('/tmp/graft_robots_cases.tsv', 'utf8')
  .split('\n').filter(l => l.length > 0);

const out = [];
const parsed = new Map();
for (const line of lines) {
  const [idx, b64, url, ua] = line.split('\t');
  if (!parsed.has(idx)) {
    const txt = Buffer.from(b64, 'base64').toString('utf8');
    parsed.set(idx, robotsParser('http://fuzz-robots.example/robots.txt', txt));
  }
  // reference semantics (src/robots.ts:91): raw isAllowed; same-origin
  // URLs always yield a boolean
  const allowed = parsed.get(idx).isAllowed(url, ua);
  out.push(`${idx}\t${url}\t${ua}\t${allowed}`);
}
writeFileSync('src/test/resources/golden_robots.tsv', out.join('\n') + '\n');
console.log(`${out.length} robots goldens`);
