SELECT COUNT(*) FROM site as s, question as q, answer as a
WHERE q.site_id = s.site_id AND a.site_id = s.site_id AND a.question_id = q.id
  AND s.site_name = 'stackoverflow' AND q.view_count >= 1000 AND a.score >= 5;
