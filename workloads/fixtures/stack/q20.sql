SELECT COUNT(*) FROM site as s, question as q, answer as a, comment as c
WHERE q.site_id = s.site_id AND a.question_id = q.id AND a.site_id = s.site_id
  AND c.post_id = q.id AND c.site_id = s.site_id
  AND s.site_name IN ('superuser','askubuntu') AND q.score >= 3
  AND a.score >= 1 AND c.score >= 2;
