SELECT COUNT(*) FROM users as u, posts as p WHERE p.OwnerUserId = u.Id AND u.Reputation<=655 AND u.DownVotes>=4 AND p.CommentCount<=19;
